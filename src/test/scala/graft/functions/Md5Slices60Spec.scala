package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class Md5Slices60Spec extends AnyFunSuite with SparkSpec with Matchers {

  /** The composed forms the kernel replaces (d50's two schedule draws):
    * hex digits 1-15 and 17-31 of one md5 — exactly what the DuckDB
    * oracle replays with substr(md5(x), 1, 15) / substr(md5(x), 17, 15).
    */
  private val composedHi = "cast(conv(substring(md5(x),1,15),16,10) as long)"
  private val composedLo = "cast(conv(substring(md5(x),17,15),16,10) as long)"

  test("both slices are bit-identical to the composed md5/conv forms on doc_id strings") {
    val df = graft.Tables.documents(spark, sf001)
      .select(col("doc_id").cast("string").as("x"))
    val diff = df.select(
        Md5Slices60.md5Slices60(col("x")).as("native"),
        expr(composedHi).as("hi"), expr(composedLo).as("lo"))
      .filter(!(col("native").getItem(0) <=> col("hi")) ||
        !(col("native").getItem(1) <=> col("lo")))
      .count()
    diff shouldBe 0L
  }

  test("slices match the composed forms on generated unicode strings incl. empty") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val alphabet = "abcXYZ09 .,;äöüéλπ世界"
    val rows = "" +: Seq.fill(300)(
      Seq.fill(rnd.nextInt(24))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = rows.toDF("x")
    val diff = df.select(
        Md5Slices60.md5Slices60(col("x")).as("native"),
        expr(composedHi).as("hi"), expr(composedLo).as("lo"))
      .filter(!(col("native").getItem(0) <=> col("hi")) ||
        !(col("native").getItem(1) <=> col("lo")))
      .count()
    diff shouldBe 0L
  }

  test("scalar md5Prefix60 == slice 0 == the composed form (the suite-wide draw convention)") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val rows = "" +: Seq.fill(200)(
      s"${rnd.nextLong()}:${Seq("temp", "order", "split", "pack", "mix")(rnd.nextInt(5))}")
    val df = rows.toDF("x")
    val diff = df.select(
        Md5Slices60.md5Prefix60(col("x")).as("scalar"),
        Md5Slices60.md5Slices60(col("x")).getItem(0).as("slice0"),
        expr(composedHi).as("hof"))
      .filter(!(col("scalar") <=> col("slice0")) || !(col("scalar") <=> col("hof")))
      .count()
    diff shouldBe 0L
  }

  test("null input yields null; the two slices differ (independence sanity)") {
    import spark.implicits._
    val df = Seq(Some("7"), None).toDF("x")
    val rows = df.select(Md5Slices60.md5Slices60(col("x")).as("s")).collect()
    assert(rows.exists(_.isNullAt(0)))
    val s = rows.find(!_.isNullAt(0)).get.getSeq[Long](0)
    s.length shouldBe 2
    assert(s(0) != s(1))
    // the in-memory replay helpers (SparkSpec) agree with the kernel
    s(0) shouldBe md5Prefix60("7")
    s(1) shouldBe md5Second60("7")
  }
}
