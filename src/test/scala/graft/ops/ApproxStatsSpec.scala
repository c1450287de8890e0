package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q_approx_stats has no value-exact oracle (sketch bits depend on merge
  * order), so this spec pins the contract a sketch actually makes: the
  * approximate answers sit within their documented error bounds of the
  * EXACT answers computed by the exact twins (qPercentiles /
  * qDistinctSuppliers' machinery).
  */
class ApproxStatsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("approx percentiles and distinct counts stay within their error bounds of exact") {
    val approx = RelationalOps.qApproxStats(spark, sf01).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("p50_approx"), r.getAs[Double]("p90_approx"),
          r.getAs[Long]("n_supp_approx"), r.getAs[Long]("n"))).toMap

    val exact = graft.Tables.lineitem(spark, sf01)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9))").as("ps"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getSeq[Double](r.fieldIndex("ps")), r.getAs[Long]("n_supp"), r.getAs[Long]("n"))).toMap

    approx.keySet shouldBe exact.keySet
    exact.foreach { case (flag, (ps, nSupp, n)) =>
      val (p50a, p90a, nSuppA, na) = approx(flag)
      na shouldBe n // plain count is exact in both
      // approx_percentile(accuracy = 10000) bounds the RANK error by
      // n/10000; translate to a generous value tolerance via the spread
      val spread = ps(1) - ps(0)
      math.abs(p50a - ps(0)) should be <= math.max(spread * 0.05, 1.0)
      math.abs(p90a - ps(1)) should be <= math.max(spread * 0.05, 1.0)
      // HLL++ at rsd = 0.02: 5 sigma leaves ~zero flake probability
      math.abs(nSuppA.toDouble - nSupp) should be <= math.max(nSupp * 0.10, 2.0)
    }
  }
}
