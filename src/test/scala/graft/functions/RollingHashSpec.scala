package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class RollingHashSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** The composed higher-order form the kernel replaces (d10's original). */
  private val composed =
    """aggregate(
         transform(split(text, ''), c -> cast(ascii(c) as bigint)),
         cast(0 as bigint),
         (acc, x) -> (acc * 31 + x) % 1000000007)"""

  test("native kernel is bit-identical to the composed split/aggregate form on the corpus") {
    val diff = graft.Tables.documents(spark, sf001)
      .select(
        RollingHash.rollingHash(col("text")).as("native"),
        expr(composed).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    diff shouldBe 0L
  }

  test("native kernel matches the composed form on generated BMP strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abc XYZ09.,;äöüéλπ世界"
    val rows = Seq.fill(300)(
      Seq.fill(rnd.nextInt(120))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = rows.map(Tuple1(_)).toDF("text")
    val diff = df.select(
        RollingHash.rollingHash(col("text")).as("native"),
        expr(composed).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    diff shouldBe 0L
  }

  test("empty string hashes to 0; null yields null") {
    import spark.implicits._
    val df = Seq(Tuple1("")).toDF("text")
    df.select(RollingHash.rollingHash(col("text"))).head().getLong(0) shouldBe 0L
    val n = df.select(RollingHash.rollingHash(lit(null).cast("string"))).head()
    assert(n.isNullAt(0))
  }
}
