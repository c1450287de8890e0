package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The built-in sketches (qApproxStatsBuiltin) have no value-exact
  * oracle (sketch bits depend on merge order), so this spec pins the
  * contract a sketch actually makes: the approximate answers sit within
  * their documented error bounds of the EXACT answers computed by the
  * exact twins (qPercentiles / qDistinctSuppliers' machinery). The
  * deterministic KMV gate form is hash-oracled by the driver and
  * error-bounded by ApproxKmvSpec.
  */
class ApproxStatsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("approx percentiles and distinct counts stay within their error bounds of exact") {
    val approx = RelationalOps.qApproxStatsBuiltin(spark, sf01).collect()
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

    // the sketch's actual contract is a RANK bound, not a value bound:
    // approx_percentile(accuracy = 10000) returns an element whose rank
    // is within n/10000 of the target — so assert the approx value lies
    // between the EXACT order statistics at target-rank +- (n/10000 + 1),
    // valid on any distribution (a value tolerance derived from spread is
    // not: rank error can cross a density cliff)
    val byFlag = graft.Tables.lineitem(spark, sf01)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getDouble(1)).sorted }

    approx.keySet shouldBe exact.keySet
    exact.foreach { case (flag, (ps, nSupp, n)) =>
      val (p50a, p90a, nSuppA, na) = approx(flag)
      na shouldBe n // plain count is exact in both
      val sorted = byFlag(flag)
      val eps = n / 10000 + 1 // rank-error bound + floor/ceil rounding slack
      def bracket(p: Double): (Double, Double) = {
        val t = math.ceil(p * n).toLong
        (sorted((math.max(1L, t - eps) - 1).toInt),
          sorted((math.min(n, t + eps) - 1).toInt))
      }
      val (lo50, hi50) = bracket(0.5)
      val (lo90, hi90) = bracket(0.9)
      assert(lo50 <= p50a && p50a <= hi50,
        s"$flag p50=$p50a outside exact rank bracket [$lo50, $hi50] (exact ${ps(0)})")
      assert(lo90 <= p90a && p90a <= hi90,
        s"$flag p90=$p90a outside exact rank bracket [$lo90, $hi90] (exact ${ps(1)})")
      // HLL++ at rsd = 0.02: 5 sigma leaves ~zero flake probability
      math.abs(nSuppA.toDouble - nSupp) should be <= math.max(nSupp * 0.10, 2.0)
    }
  }
}
