package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property pin for `CorpusOps.tokenBudgetOver` — the bucket-decomposed
  * greedy-prefix selection behind d39 — against an in-memory reference
  * that sorts and scans. The DuckDB oracle covers one corpus; this
  * covers the decomposition's structural edge cases explicitly: scores
  * tied ACROSS a bucket boundary's two sides, every row in one bucket,
  * empty buckets between occupied ones, budgets below the first row and
  * above the whole corpus.
  */
class TokenBudgetPropSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Reference: sort by (q_ppm desc, doc_id), scan, keep while the
    * running total BEFORE the row is under budget.
    */
  private def reference(rows: Seq[(Long, Long, Long)], budget: Long): Set[(Long, Long)] = {
    var cum = 0L
    rows.sortBy { case (id, _, q) => (-q, id) }.flatMap { case (id, n, _) =>
      val keep = if (cum < budget) Some((id, cum)) else None
      cum += n
      keep
    }.toSet
  }

  private def run(rows: Seq[(Long, Long, Long)], budget: Long): Set[(Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "n_tokens", "q_ppm")
      .repartition(7) // force the decomposition across partitions
    CorpusOps.tokenBudgetOver(df, budget)
      .select(col("doc_id"), col("cum_before"))
      .as[(Long, Long)].collect().toSet
  }

  test("bucket decomposition == sort-and-scan on adversarial score/tie corpora") {
    // q_ppm drawn from values clustered AT bucket boundaries (125000k
    // and 125000k-1) plus ties, so bucket splits land mid-tie-group
    val qGen = Gen.oneOf(
      Gen.choose(0L, 1000000L),
      Gen.oneOf(0L, 124999L, 125000L, 249999L, 250000L, 250000L, 999999L, 1000000L))
    val rowGen = for {
      n <- Gen.choose(0L, 50L)
      q <- qGen
    } yield (n, q)
    val corpusGen = for {
      m <- Gen.choose(1, 120)
      rows <- Gen.listOfN(m, rowGen)
      budget <- Gen.oneOf(Gen.const(0L), Gen.const(1L), Gen.choose(1L, 400L),
        Gen.const(Long.MaxValue / 4))
    } yield (rows.zipWithIndex.map { case ((n, q), i) => (i.toLong, n, q) }, budget)

    val prop = Prop.forAll(corpusGen) { case (rows, budget) =>
      run(rows, budget) == reference(rows, budget)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("degenerate shapes: all one bucket, budget 0, budget over the corpus") {
    // all rows share one quality (single bucket, pure doc_id order)
    val oneBucket = (0L until 40L).map(i => (i, 10L, 500000L))
    run(oneBucket, 100L) shouldBe reference(oneBucket, 100L)
    // budget 0 selects nothing
    assert(run(oneBucket, 0L).isEmpty)
    // a budget past the corpus selects everything
    run(oneBucket, 100000L).map(_._1) shouldBe oneBucket.map(_._1).toSet
  }
}
