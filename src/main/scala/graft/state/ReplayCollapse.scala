package graft.state

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Q2 `dedupAndGroupByKey` / `removeReprocessed`: the reference's at-least-
  * once verification oracle. After a failover, KCL replays a shard from the
  * last checkpoint, so a consumer observes the original per-key sequence with
  * one or more *contiguous suffix-replay runs* appended; true reorderings, or
  * a replay that regresses past an earlier restart point, are errors.
  *
  * Semantics: /root/reference/src/it/scala/com/contxt/kinesis/MessageUtil.scala:9-61,
  * pinned by the 13 cases in MessageUtilTest.scala:15-96.
  *
  * This file re-implements the algorithm from those observable semantics
  * (not a translation): a single forward scan with a replay cursor and a
  * monotone restart floor.
  */
object ReplayCollapse {

  final class UnexpectedMessageSequence(msg: String) extends RuntimeException(msg)

  /** Collapse contiguous replay runs out of a per-key received sequence.
    *
    * Invariants enforced (each maps to a MessageUtilTest failure case):
    *  - a repeated message must restart a replay of the previously seen
    *    suffix, in order (mismatch mid-replay that is not itself a valid
    *    restart ⇒ error);
    *  - restart points are monotonically non-decreasing (a replay may not
    *    regress past an earlier restart point ⇒ error);
    *  - a never-seen message while mid-replay ⇒ error.
    *
    * Messages are assumed unique within a key's original sequence (the
    * reference's producers emit strictly sequential `msg_%03d`,
    * KinesisTestComponents.scala:32-47).
    */
  def collapse(received: Seq[String]): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    val seen = scala.collection.mutable.HashMap.empty[String, Int]
    var cursor = -1        // next index in `out` the active replay must match
    var restartFloor = 0   // earliest index a future replay may restart from

    def startReplay(m: String): Unit = {
      val i = seen.getOrElse(m, -1)
      if (i < 0)
        throw new UnexpectedMessageSequence(s"unexpected message during replay: $m")
      if (i < restartFloor)
        throw new UnexpectedMessageSequence(
          s"replay restarts at $i, before earlier restart point $restartFloor: $m")
      restartFloor = i
      cursor = i + 1
      if (cursor == out.length) cursor = -1 // single-element suffix replayed
    }

    received.foreach { m =>
      if (cursor >= 0) {
        if (out(cursor) == m) {
          cursor += 1
          if (cursor == out.length) cursor = -1
        } else startReplay(m)
      } else if (seen.contains(m)) {
        startReplay(m)
      } else {
        seen(m) = out.length
        out += m
      }
    }
    out.toIndexedSeq
  }

  /** Q2 as a DataFrame operator with a deterministic replayed input:
    * per key, re-append the 3 highest-sequence records (a suffix-replay run,
    * exactly what a restart from the last checkpoint produces), then collapse.
    * The collapsed output must equal Q1's original reconstruction — which is
    * the DuckDB oracle.
    *
    * SCALE: groupByKey + mapGroups shuffles once on the stream key; state is
    * per-key and streamed group-at-a-time by Spark's ObjectHashAggregate-style
    * iterator (no global collect). In production this runs per micro-batch
    * epoch, keyed state bounded by replay depth.
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
      .mapGroups { (uid, it) =>
        val msgs = it.toArray.sortBy(r => (r._2, r._3)).map(_._4)
        (uid, collapse(msgs.toIndexedSeq).mkString(","))
      }
      .toDF("user_id", "msgs")
  }
}
