package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the EXECUTED-plan invariants that justified the r15 cache
  * reverts and the d2/d14 cache keeps — as runtime facts, not notes
  * (r15 verdict item 6). `ScanProfileSpec` pins the pre-execution
  * LOGICAL scan counts; for the queries below those counts deliberately
  * exceed the physical passes, and this spec pins why:
  *
  *  - d49/d53/d9 (caches reverted): their self-join branches build
  *    canonically-equal shuffle exchanges that `ReusedExchange`
  *    deduplicates at runtime — the plain form physically scans ONCE
  *    where the logical plan shows 6/4/2 scans. A vanished
  *    ReusedExchange here means a planner/stats change re-introduced
  *    the d51-class double evaluation: re-measure before shipping.
  *  - d20/d28 (caches reverted): their two scans are DIFFERENT slices
  *    (held-out eval vs train) — no reuse expected or asserted; the
  *    revert was purely cache build overhead.
  *  - d2/d14 (caches kept): all text scans live inside ONE cached
  *    relation; the executed plan runs ZERO direct parquet scans and
  *    every consumer reads the cache. The r15 formatted dump showed d2
  *    "growing" 6→7 Scan parquet nodes — that is the dump RE-PRINTING
  *    the cache's build subtree under every InMemoryTableScan; an
  *    InMemoryRelation materializes once, which `distinctCaches == 1`
  *    pins (the cache is not double-building under real stats).
  */
class ExecutedPlanSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def stats(name: String): ExecAudit.ExecStats = {
    spark.catalog.clearCache()
    ExecAudit.executedStats(SparkEntry.queries(name)(spark, sf001))
  }

  test("reverted self-join sites dedupe their equal exchanges at runtime") {
    val d49 = stats("d49_containment")
    withClue(d49) {
      d49.reusedExchanges should be >= 2
      d49.directParquetScans should be <= 2
    }
    val d53 = stats("d53_winnow_overlap")
    withClue(d53) {
      d53.reusedExchanges should be >= 1
      d53.directParquetScans should be <= 2
    }
    val d9 = stats("d9_embed_neardup")
    withClue(d9) {
      d9.reusedExchanges should be >= 1
      d9.directParquetScans should be <= 2
    }
  }

  test("d20/d28's two scans are different slices — two passes by design") {
    stats("d20_contamination").directParquetScans shouldBe 2
    stats("d28_dup_spans").directParquetScans shouldBe 2
  }

  test("d2/d14 execute zero direct text scans through exactly one cache") {
    for (q <- Seq("d2_minhash_lsh", "d14_ngram_jaccard")) {
      val s = stats(q)
      withClue(s"$q: $s") {
        s.directParquetScans shouldBe 0
        s.distinctCaches shouldBe 1
        s.inMemoryScans should be >= 2
      }
    }
  }
}
