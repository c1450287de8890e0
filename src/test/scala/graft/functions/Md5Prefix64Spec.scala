package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class Md5Prefix64Spec extends AnyFunSuite with SparkSpec with Matchers {

  /** The composed form the kernel replaces (d5/d12's feature-hash step). */
  private val composed =
    "transform(xs, x -> cast(conv(substring(md5(x),1,15),16,10) as long))"

  test("native kernel is bit-identical to the composed md5/conv form on corpus words") {
    val df = graft.Tables.documents(spark, sf001)
      .select(expr("array_distinct(split(lower(trim(text)), ' '))").as("xs"))
    val diff = df.select(
        Md5Prefix64.md5Prefix64(col("xs")).as("native"),
        expr(composed).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    diff shouldBe 0L
  }

  test("native kernel matches the composed form on generated unicode strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val alphabet = "abcXYZ09 .,;äöüéλπ世界"
    val rows = Seq.fill(200)(
      Seq.fill(1 + rnd.nextInt(30))(
        Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString))
    val df = rows.map(Tuple1(_)).toDF("xs")
    val diff = df.select(
        Md5Prefix64.md5Prefix64(col("xs")).as("native"),
        expr(composed).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    diff shouldBe 0L
  }

  test("null elements and null arrays pass through as null") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(Option("a"), None, Option("b")))).toDF("xs")
    val got = df.select(Md5Prefix64.md5Prefix64(col("xs"))).head().getSeq[Any](0)
    got.length shouldBe 3
    assert(got(1) == null && got(0) != null && got(2) != null)
    val n = df.select(Md5Prefix64.md5Prefix64(lit(null).cast("array<string>"))).head()
    assert(n.isNullAt(0))
  }
}
