package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MinHashSignatureSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val p = 2147483647L
  private val sa = Seq(1234567L, 87654321L, 1999999999L)
  private val sb = Seq(7L, 42L, 1000000L)

  test("native kernel equals the composed array_min(transform(...)) form") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)(Seq.fill(1 + rnd.nextInt(50))(rnd.nextLong().abs % p))
    val df = rows.map(Tuple1(_)).toDF("hs")
    val composed = sa.zip(sb)
      .map { case (ai, bi) => s"array_min(transform(hs, h -> (h * ${ai}L + ${bi}L) % ${p}L))" }
      .mkString("array(", ", ", ")")
    val diff = df.select(
        MinHashSignature.minhashSignature(col("hs"), sa, sb, p).as("native"),
        expr(composed).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    diff shouldBe 0L
  }

  test("empty array yields Long.MaxValue minima; null yields null") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
    val row = df.select(MinHashSignature.minhashSignature(col("hs"), sa, sb, p)).head()
    row.getSeq[Long](0) shouldBe Seq.fill(3)(Long.MaxValue)
    val n = df.select(
      MinHashSignature.minhashSignature(lit(null).cast("array<bigint>"), sa, sb, p)).head()
    assert(n.isNullAt(0))
  }
}
