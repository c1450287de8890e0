package graft.ops

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** d50's stage caches must be spill-ready (MEMORY_AND_DISK_SER — a
  * memory-pressured executor degrades to disk instead of evicting and
  * recomputing the text-reading base), and the returned plan must stay
  * correct even when every cached block IS evicted (lineage recompute:
  * the constrained-memory worst case).
  */
class D50PersistSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("stage caches persist MEMORY_AND_DISK_SER and survive full eviction") {
    val out = CorpusOps.d50TrainingPlan(spark, sf001)
    val rows = out.collect().sortBy(r => r.getLong(0))
    rows.length should be > 0

    CorpusOps.d50Caches.map(_.currentLevel) shouldBe
      Seq.fill(3)(Some(StorageLevel.MEMORY_AND_DISK_SER))

    // evict every cached block, then replay the SAME returned frame:
    // recompute-from-lineage must reproduce the plan exactly (the
    // schedule is deterministic end to end, so eviction can't change it)
    spark.catalog.clearCache()
    val replay = out.collect().sortBy(r => r.getLong(0))
    replay shouldBe rows
  }
}
