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

/** Property pin for `StreamingQueries.boundedNearDupPairs` — the same
  * contract `BoundedDupPositionsPropSpec` pins for the dup-span tracker,
  * applied to the bounded LSH near-dup tracker:
  *
  *  (a) SOUND: every emitted pair is a pair of the full-history batch
  *      answer (`CorpusOps.nearDupPairs` over everything);
  *  (b) COMPLETE in the horizon: a pair whose members arrive in the same
  *      tranche is always found;
  *  (c) BOUNDED: live bucket count never exceeds the distinct band
  *      buckets ever seen, and once the stream outlives the horizon the
  *      tracker must have evicted and ended below that ceiling.
  *
  * Corpora are adversarial the same way: mostly globally-unique texts
  * (the watermark-stall shape — unique docs emit NO pairs, so the
  * pairs-side watermark node alone would never advance), with a random
  * subset of exact copies planting Jaccard-1.0 pairs. Pair identity
  * (a_id, b_id) is compared, not the jaccard value, so a ~2^-60 gram-hash
  * collision can never flake the property.
  */
class BoundedNearDupPropSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val schemaTs = StructType(ShardedCorpus.schema.fields :+ StructField("ts", TimestampType))

  private case class Scenario(nDocs: Int, nWords: Int, copyOf: Map[Int, Int],
      gapSec: Int, cuts: (Int, Int), watermarkSec: Int, ttlSec: Int)

  private val genScenario: Gen[Scenario] = for {
    nDocs <- Gen.choose(70, 100)
    nWords <- Gen.choose(9, 14)
    gapSec <- Gen.choose(2, 4)
    wmSec <- Gen.choose(20, 60)
    ttlSec <- Gen.choose(20, 60)
    c1 <- Gen.choose(nDocs / 5, nDocs / 2)
    c2 <- Gen.choose(c1 + nDocs / 5, nDocs - nDocs / 10)
    copyFlags <- Gen.listOfN(nDocs, Gen.prob(0.3))
    copyTargets <- Gen.listOfN(nDocs, Gen.choose(0, nDocs - 1))
  } yield Scenario(nDocs, nWords,
    copyFlags.zipWithIndex.collect { case (true, i) if i > 0 => i -> (copyTargets(i) % i) }.toMap,
    gapSec, (c1, c2), wmSec, ttlSec)

  private def docsDf(sc: Scenario): DataFrame = {
    import spark.implicits._
    val texts = new Array[String](sc.nDocs)
    (0 until sc.nDocs).foreach { i =>
      texts(i) = sc.copyOf.get(i) match {
        case Some(j) => texts(j)
        case None => (0 until sc.nWords).map(w => s"u${i}w$w").mkString(" ")
      }
    }
    (0 until sc.nDocs).map(i => (i.toLong, texts(i), "en", "synthetic", texts(i).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id") * sc.gapSec))
  }

  private def batchPairs(df: DataFrame): Set[(Long, Long)] =
    graft.ops.CorpusOps.nearDupPairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def runTranche(dir: String, ckpt: String, sc: Scenario,
      got: mutable.Buffer[(Long, Long)],
      tracker: mutable.Buffer[org.apache.spark.sql.streaming.StateOperatorProgress]): Unit = {
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val wmKey = "spark.sql.streaming.multipleWatermarkPolicy"
    spark.conf.set(checkKey, "false")
    spark.conf.set(wmKey, "max")
    val q = try StreamingQueries.boundedNearDupPairs(
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

  test("property: sound, in-horizon complete, bucket-state-bounded over random corpora/tranches/horizons") {
    val prop = Prop.forAll(genScenario) { sc =>
      val all = docsDf(sc)
      val tranches = Seq(
        all.filter(col("doc_id") < sc.cuts._1),
        all.filter(col("doc_id") >= sc.cuts._1 && col("doc_id") < sc.cuts._2),
        all.filter(col("doc_id") >= sc.cuts._2))
      val base = Files.createTempDirectory("graft-ndprop-").toString
      val dir = s"$base/shards"

      val got = mutable.Buffer.empty[(Long, Long)]
      val tracker = mutable.Buffer.empty[org.apache.spark.sql.streaming.StateOperatorProgress]
      tranches.foreach { t =>
        ShardedEvents.routed(t, col("doc_id"), col("doc_id"), ShardedCorpus.NumShards)
          .write.mode("append").partitionBy("shard").parquet(dir)
        runTranche(dir, s"$base/ckpt", sc, got, tracker)
      }
      val g = got.synchronized(got.toSet)

      val allPairs = batchPairs(all)
      val inTranche = tranches.map(batchPairs).reduce(_ union _)
      val nBuckets = graft.ops.CorpusOps.bandedGramRows(all)
        .select("band_key").distinct().count()
      val maxState = tracker.map(_.numRowsTotal).max
      val lastState = tracker.last.numRowsTotal
      val removed = tracker.map(_.numRowsRemoved).sum

      val sound = Prop(g.subsetOf(allPairs)) :| s"false pairs: ${g.diff(allPairs).take(3)}"
      val complete = Prop(inTranche.subsetOf(g)) :| s"missed in-horizon: ${inTranche.diff(g).take(3)}"
      val bounded = Prop(maxState <= nBuckets) :| s"state $maxState > $nBuckets distinct buckets"
      val evicts = Prop(removed > 0 && lastState < nBuckets) :|
        s"no eviction (removed=$removed, last=$lastState, buckets=$nBuckets)"
      sound && complete && bounded && evicts
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(4), prop)
    assert(res.passed, res.status.toString)
  }
}
