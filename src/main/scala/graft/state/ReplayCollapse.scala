package graft.state

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Q2 `dedupAndGroupByKey` / `removeReprocessed`: the reference's at-least-
  * once verification oracle. After a failover, KCL replays a shard from the
  * last checkpoint, so a consumer observes the original per-key sequence with
  * one or more *contiguous replay runs* spliced in; true reorderings, or a
  * replay that regresses past an earlier restart point, are errors.
  *
  * Semantics: /root/reference/src/it/scala/com/contxt/kinesis/MessageUtil.scala:24-61,
  * pinned by the 13 cases in MessageUtilTest.scala:8-96 (ported to
  * graft.state.ReplayCollapseSpec, plus ScalaCheck properties).
  *
  * This file re-implements the algorithm from those observable semantics
  * (not a translation): a single forward scan over a buffered iterator. A
  * replay run triggered by a repeated message restarts at that message's
  * original position and consists of one or more retry passes over the
  * replayed suffix (intermediate passes may be cut short, e.g.
  * `m1,m2,m3,m2,m2,m3,m4`), but the final pass must reach the end of the
  * suffix — a run that stops mid-suffix is an error, and restart points are
  * monotonically non-decreasing across runs.
  */
object ReplayCollapse {

  final class UnexpectedMessageSequence(msg: String) extends RuntimeException(msg)

  /** Collapse contiguous replay runs out of a per-key received sequence.
    *
    * Messages are assumed unique within a key's original sequence (the
    * reference's producers emit strictly sequential `msg_%03d`,
    * KinesisTestComponents.scala:32-47).
    *
    * Consumes the input as a streaming iterator: state is O(distinct
    * messages) — the collapsed output itself — never O(received).
    */
  def collapse(received: Iterator[String]): IndexedSeq[String] = {
    val in = received.buffered
    val out = ArrayBuffer.empty[String]
    val pos = mutable.HashMap.empty[String, Int]
    var floor = 0 // earliest position a replay may restart from (monotone)

    while (in.hasNext) {
      val m = in.head
      pos.get(m) match {
        case None =>
          pos(m) = out.length
          out += m
          in.next()
        case Some(start) =>
          if (start < floor)
            throw new UnexpectedMessageSequence(
              s"replay restarts at $start, before earlier restart point $floor: $m")
          floor = start
          val sliceLen = out.length - start
          // Consume retry passes over out[start, out.length): each pass
          // matches a prefix of the suffix; passes repeat while progress is
          // made; the final matched element must be the suffix's last.
          var lastMatched: String = null
          var progressed = true
          while (progressed) {
            var i = 0
            while (in.hasNext && i < sliceLen && in.head == out(start + i)) {
              lastMatched = in.next()
              i += 1
            }
            progressed = i > 0
          }
          if (lastMatched != out.last)
            throw new UnexpectedMessageSequence(
              s"replay starting from $m stopped before completing the replayed suffix")
      }
    }
    out.toIndexedSeq
  }

  def collapse(received: Seq[String]): IndexedSeq[String] =
    collapse(received.iterator)

  /** Q2 as a DataFrame operator with a deterministic replayed input:
    * per key, re-append the 3 highest-sequence records (a suffix-replay run,
    * exactly what a restart from the last checkpoint produces), then collapse.
    * The collapsed output must equal Q1's original reconstruction — which is
    * the DuckDB oracle.
    *
    * SCALE: one shuffle on the stream key; `flatMapSortedGroups` plans the
    * (replay, event_id) secondary sort *inside* that shuffle's sort, so the
    * collapse consumes an already-ordered streaming iterator — per-key state
    * is O(distinct messages) (the output), never a buffered copy of the
    * group. A hot key costs CPU, not executor heap.
    */
  def q2DedupReplay(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir).select(
      col("user_id"),
      col("event_id"),
      concat(col("event_id").cast("string"), lit(":"), col("props")).as("msg"))

    val wDesc = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    val replayed = ev
      .withColumn("rnk", row_number().over(wDesc))
      .filter(col("rnk") <= 3)
      .drop("rnk")
      .withColumn("replay", lit(1))
    val received = ev.withColumn("replay", lit(0)).unionByName(replayed)

    received
      .select(col("user_id"), col("replay"), col("event_id"), col("msg"))
      .as[(Long, Int, Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("replay"), col("event_id")) { (uid, it) =>
        Iterator.single((uid, collapse(it.map(_._4)).mkString(",")))
      }
      .toDF("user_id", "msgs")
  }
}
