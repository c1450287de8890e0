package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The deterministic KMV gate form of q_approx_stats: replay the whole
  * sketch in memory and require bit-equality, then pin the estimates'
  * quality against the exact answers on the fixed corpus (deterministic
  * data, so fixed margins can't flake).
  */
class ApproxKmvSpec extends AnyFunSuite with SparkSpec with Matchers {


  test("q_approx_stats == in-memory KMV replay, and estimates track exact") {
    val rows = graft.Tables.lineitem(spark, sf01)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_suppkey"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))

    val expected = rows.groupBy(_._1).map { case (flag, rs) =>
      val sample = rs
        .map { case (_, ok, ln, cents, _) => (md5Prefix60(s"${ok}_$ln"), cents) }
        .distinct.sorted.take(1024).map(_._2).sorted
      val kk = sample.length
      def at(p: Int) = sample(((p * kk + 9) / 10) - 1)
      val hks = rs.map(t => md5Prefix60(t._5.toString)).distinct.sorted.take(64)
      val nSupp =
        if (hks.length < 64) hks.length.toLong
        else math.floor(63.0 * 1152921504606846976.0 / hks.last.toDouble).toLong
      flag -> (at(5), at(9), nSupp, rs.length.toLong)
    }

    val got = RelationalOps.qApproxStats(spark, sf01).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("p50_cents"), r.getAs[Long]("p90_cents"),
          r.getAs[Long]("n_supp_approx"), r.getAs[Long]("n"))).toMap
    got shouldBe expected

    // quality on the fixed corpus: a 1024-row sample's order statistics
    // sit within a few percent of the exact percentiles; KMV at k=64
    // over 100 true suppliers lands within ~3 rsd = 38%
    val exact = rows.groupBy(_._1).map { case (flag, rs) =>
      val sorted = rs.map(_._4).sorted
      def q(p: Double) = sorted(math.ceil(p * sorted.length).toInt - 1)
      flag -> (q(0.5), q(0.9), rs.map(_._5).distinct.length.toLong)
    }
    exact.foreach { case (flag, (p50, p90, nSupp)) =>
      val (p50a, p90a, nSuppA, _) = got(flag)
      assert(math.abs(p50a - p50).toDouble <= 0.10 * p50, s"$flag p50 $p50a vs $p50")
      assert(math.abs(p90a - p90).toDouble <= 0.10 * p90, s"$flag p90 $p90a vs $p90")
      assert(math.abs(nSuppA - nSupp).toDouble <= 0.38 * nSupp,
        s"$flag n_supp $nSuppA vs $nSupp")
    }
  }
}
