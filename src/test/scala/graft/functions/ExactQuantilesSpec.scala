package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins `exact_quantiles` bit-identical to the built-in `percentile`
  * (Spark's exact linear-interpolation form, the one the DuckDB oracle
  * replays as quantile_cont) on grouped data with duplicates, singleton
  * groups, and nulls — the contract that let q_percentiles swap its
  * boxed OpenHashMap buffer for the primitive array.
  */
class ExactQuantilesSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Ps = Seq(0.0, 0.1, 0.5, 0.9, 0.99, 1.0)
  private val psSql = Ps.mkString("array(", ", ", ")")

  test("grouped quantiles match the built-in percentile bit-exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // duplicates on purpose: values drawn from a small lattice
    val rows = Seq.tabulate(50000)(i =>
      (i % 7, math.rint(rnd.nextGaussian() * 500) / 4))
    val df = rows.toDF("g", "x")
    val diff = df.groupBy(col("g")).agg(
        ExactQuantiles.exactQuantiles(col("x"), Ps).as("native"),
        expr(s"percentile(x, $psSql)").as("builtin"))
      .filter(!(col("native") <=> col("builtin")))
      .count()
    diff shouldBe 0L
  }

  test("lineitem prices: same values as the built-in at sf0.01") {
    val li = graft.Tables.lineitem(spark, sf01)
    val diff = li.groupBy(col("l_returnflag")).agg(
        ExactQuantiles.exactQuantiles(col("l_extendedprice"), Seq(0.5, 0.9)).as("native"),
        expr("percentile(l_extendedprice, array(0.5, 0.9))").as("builtin"))
      .filter(!(col("native") <=> col("builtin")))
      .count()
    diff shouldBe 0L
  }

  test("singleton group, all-null group, and mixed nulls") {
    import spark.implicits._
    val df = Seq(
      (0, Some(42.0)),
      (1, None), (1, None),
      (2, Some(1.0)), (2, None), (2, Some(3.0))).toDF("g", "x")
    val out = df.groupBy(col("g")).agg(
        ExactQuantiles.exactQuantiles(col("x"), Ps).as("native"),
        expr(s"percentile(x, $psSql)").as("builtin"))
      .filter(!(col("native") <=> col("builtin")))
    out.count() shouldBe 0L
  }
}
