package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SimHashBitsSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** The composed higher-order form the kernel replaces (d5's original
    * expression), parameterized by width.
    */
  private def composed(bits: Int): String =
    s"""aggregate(
          transform(sequence(0, ${bits - 1}), j ->
            CASE WHEN 2 * size(filter(hs, h -> shiftright(h, j) % 2 = 1)) >= size(hs)
                 THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END),
          cast(0 as bigint), (acc, x) -> acc + x)"""

  test("native kernel is bit-identical to the composed aggregate/filter form at 16 and 48 bits") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(300)(Seq.fill(1 + rnd.nextInt(80))(rnd.nextLong().abs % (1L << 60)))
    val df = rows.map(Tuple1(_)).toDF("hs")
    Seq(16, 48).foreach { bits =>
      val diff = df.select(
          SimHashBits.simhashBits(col("hs"), bits).as("native"),
          expr(composed(bits)).as("hof"))
        .filter(!(col("native") <=> col("hof")))
        .count()
      withClue(s"width $bits:") { diff shouldBe 0L }
    }
  }

  test("kernel matches the composed form on the real document word hashes") {
    val hs = graft.Tables.documents(spark, sf001)
      .select(expr("transform(array_distinct(split(lower(trim(text)), ' ')), w -> cast(conv(substring(md5(w),1,15),16,10) as long))").as("hs"))
    val diff = hs.select(
        SimHashBits.simhashBits(col("hs"), 16).as("native"),
        expr(composed(16)).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    diff shouldBe 0L
  }

  test("empty array keeps the all-bits-set convention; null yields null") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
    df.select(SimHashBits.simhashBits(col("hs"), 16)).head().getLong(0) shouldBe 0xFFFFL
    val n = df.select(SimHashBits.simhashBits(lit(null).cast("array<bigint>"), 16)).head()
    assert(n.isNullAt(0))
  }
}
