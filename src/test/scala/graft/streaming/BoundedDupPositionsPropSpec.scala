package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.collection.mutable

/** Property pin for `StreamingQueries.boundedDupPositions` — the two
  * example-based StreamingSpec tests pin the MECHANISM (plateau, TTL
  * liveness under `max` watermark policy); this pins the CONTRACT over
  * randomized corpora, tranche splits and horizons:
  *
  *  (a) SOUND: every emitted mark is a mark of the full-history batch
  *      d28 answer (no false positives, any horizon);
  *  (b) COMPLETE in the horizon: a window duplicated WITHIN one tranche
  *      (its sightings co-arrive in one run, strictly inside any TTL) is
  *      always marked;
  *  (c) BOUNDED: per-gram state never exceeds the distinct windows ever
  *      seen, and once the stream's time span exceeds watermark + TTL the
  *      tracker must have evicted and ended BELOW that ceiling.
  *
  * Corpora are generated adversarially for a dedup tracker: most texts
  * globally unique (id-stamped words — the watermark-stall shape), a
  * random subset exact copies of earlier documents (guaranteed duplicate
  * 8-word windows at matching positions).
  */
class BoundedDupPositionsPropSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val schemaTs = StructType(ShardedCorpus.schema.fields :+ StructField("ts", TimestampType))

  /** One generated corpus + run shape. `copies(i) = Some(j)` makes doc i
    * an exact text copy of doc j < i.
    */
  private case class Scenario(nDocs: Int, nWords: Int, copyOf: Map[Int, Int],
      gapSec: Int, cuts: (Int, Int), watermarkSec: Int, ttlSec: Int)

  private val genScenario: Gen[Scenario] = for {
    nDocs <- Gen.choose(70, 100)
    nWords <- Gen.choose(9, 14) // >= 8 so every doc has windows
    gapSec <- Gen.choose(2, 4)
    // horizon strictly below the stream's span so eviction must happen:
    // span = (nDocs-1)*gapSec >= 138 s > watermark + ttl <= 120 s
    wmSec <- Gen.choose(20, 60)
    ttlSec <- Gen.choose(20, 60)
    c1 <- Gen.choose(nDocs / 5, nDocs / 2)
    c2 <- Gen.choose(c1 + nDocs / 5, nDocs - nDocs / 10)
    copyFlags <- Gen.listOfN(nDocs, Gen.prob(0.3))
    copyTargets <- Gen.listOfN(nDocs, Gen.choose(0, nDocs - 1))
  } yield {
    val copyOf = copyFlags.zipWithIndex.collect {
      case (true, i) if i > 0 => i -> (copyTargets(i) % i)
    }.toMap
    // a copy of a copy still resolves to concrete text at build time
    Scenario(nDocs, nWords, copyOf, gapSec, (c1, c2), wmSec, ttlSec)
  }

  private def buildDocs(sc: Scenario): Seq[(Long, String)] = {
    val texts = new Array[String](sc.nDocs)
    (0 until sc.nDocs).foreach { i =>
      texts(i) = sc.copyOf.get(i) match {
        case Some(j) => texts(j)
        case None => (0 until sc.nWords).map(w => s"u${i}w$w").mkString(" ")
      }
    }
    (0 until sc.nDocs).map(i => (i.toLong, texts(i)))
  }

  private def docsDf(rows: Seq[(Long, String)], sc: Scenario): DataFrame = {
    import spark.implicits._
    rows.map { case (id, text) => (id, text, "en", "synthetic", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id") * sc.gapSec))
  }

  /** The full-history batch answer: (doc_id, pos) of every 8-word window
    * occurring >= 2 distinct times — d28's marked-position set.
    */
  private def batchMarks(df: DataFrame): Set[(Long, Long)] = {
    val g = df.select(col("doc_id"),
        posexplode(graft.functions.WordWindowMd5.wordWindowMd5(lower(trim(col("text"))), 8)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("gh"))
    g.join(g.groupBy("gh").count().filter(col("count") >= 2).select("gh"), "gh")
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def distinctWindows(df: DataFrame): Long = df
    .select(posexplode(graft.functions.WordWindowMd5.wordWindowMd5(lower(trim(col("text"))), 8)))
    .select(col("col")).distinct().count()

  private def runTranche(dir: String, ckpt: String, sc: Scenario,
      got: mutable.Buffer[(Long, Long)],
      tracker: mutable.Buffer[org.apache.spark.sql.streaming.StateOperatorProgress]): Unit = {
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val wmKey = "spark.sql.streaming.multipleWatermarkPolicy"
    spark.conf.set(checkKey, "false")
    spark.conf.set(wmKey, "max")
    val q = try StreamingQueries.boundedDupPositions(
        ShardedEvents.openStream(spark, dir, schemaTs, None),
        s"${sc.watermarkSec} seconds", ttlMs = sc.ttlSec * 1000L)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    finally { spark.conf.unset(checkKey); spark.conf.unset(wmKey) }
    q.awaitTermination()
    assert(q.exception.isEmpty, s"tranche run failed: ${q.exception}")
    tracker ++= q.recentProgress.flatMap(_.stateOperators)
      .filter(_.operatorName.toLowerCase.contains("flatmapgroups"))
  }

  test("property: sound, in-horizon complete, state-bounded over random corpora/tranches/horizons") {
    val prop = Prop.forAll(genScenario) { sc =>
      val rows = buildDocs(sc)
      val all = docsDf(rows, sc)
      val tranches = Seq(
        all.filter(col("doc_id") < sc.cuts._1),
        all.filter(col("doc_id") >= sc.cuts._1 && col("doc_id") < sc.cuts._2),
        all.filter(col("doc_id") >= sc.cuts._2))
      val base = Files.createTempDirectory("graft-prop-").toString
      val dir = s"$base/shards"

      val got = mutable.Buffer.empty[(Long, Long)]
      val tracker = mutable.Buffer.empty[org.apache.spark.sql.streaming.StateOperatorProgress]
      tranches.foreach { t =>
        ShardedEvents.routed(t, col("doc_id"), col("doc_id"), ShardedCorpus.NumShards)
          .write.mode("append").partitionBy("shard").parquet(dir)
        runTranche(dir, s"$base/ckpt", sc, got, tracker)
      }
      val g = got.synchronized(got.toSet)

      val allMarks = batchMarks(all)
      val inTranche = tranches.map(batchMarks).reduce(_ union _)
      val nWindows = distinctWindows(all)
      val maxState = tracker.map(_.numRowsTotal).max
      val lastState = tracker.last.numRowsTotal
      val removed = tracker.map(_.numRowsRemoved).sum

      val sound = Prop(g.subsetOf(allMarks)) :| s"false marks: ${g.diff(allMarks).take(3)}"
      val complete = Prop(inTranche.subsetOf(g)) :| s"missed in-horizon: ${inTranche.diff(g).take(3)}"
      val bounded = Prop(maxState <= nWindows) :| s"state $maxState > $nWindows distinct windows"
      val evicts = Prop(removed > 0 && lastState < nWindows) :|
        s"no eviction (removed=$removed, last=$lastState, windows=$nWindows)"
      sound && complete && bounded && evicts
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(4), prop)
    assert(res.passed, res.status.toString)
  }
}
