package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins for the d70 shard manifests and the d71 snapshot diff. The
  * DuckDB oracles hash-gate full content; these hold the structural
  * contracts a loader depends on: manifests cover the plan exactly
  * once with contiguous in-range chunk windows, and the diff's status
  * partition accounts for every document on both sides.
  */
class ShardDiffSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("d70: manifests partition the plan; chunk ranges stay inside their shard window") {
    val shards = CorpusOps.d70ShardManifest(spark, sf001).collect().map { r =>
      (r.getAs[Long]("shard_id"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("first_chunk"), r.getAs[Long]("last_chunk"))
    }
    assert(shards.nonEmpty)
    val plan = CorpusOps.d50TrainingPlan(spark, sf001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")))
    // every scheduled doc lands in exactly one manifest row's count
    shards.map(_._2).sum shouldBe plan.length.toLong
    val chunksByShard = plan.map(_._2).distinct.groupBy(_ / CorpusOps.ChunksPerShard)
    shards.map(_._1).sorted shouldBe chunksByShard.keys.toArray.sorted
    shards.foreach { case (sid, _, nChunks, nTokens, first, last) =>
      withClue(s"shard $sid:") {
        nChunks shouldBe chunksByShard(sid).length.toLong
        first should be >= sid * CorpusOps.ChunksPerShard
        last should be <= (sid + 1) * CorpusOps.ChunksPerShard - 1
        first should be <= last
        nTokens should be > 0L
      }
    }
  }

  test("d71: statuses partition the fingerprints and account for every document") {
    val rows = CorpusOps.d71SnapshotDiff(spark, sf001).collect().map { r =>
      (r.getAs[String]("fp"), r.getAs[String]("status"),
        r.getAs[Long]("n_old"), r.getAs[Long]("n_new"))
    }
    assert(rows.nonEmpty)
    rows.map(_._1).distinct.length shouldBe rows.length // one row per fp
    rows.foreach { case (fp, status, nOld, nNew) =>
      withClue(s"fp $fp:") {
        status shouldBe (if (nOld == 0L) "added" else if (nNew == 0L) "removed" else "common")
        (nOld + nNew) should be > 0L
      }
    }
    val total = graft.Tables.documents(spark, sf001).count()
    rows.map(r => r._3 + r._4).sum shouldBe total
  }
}
