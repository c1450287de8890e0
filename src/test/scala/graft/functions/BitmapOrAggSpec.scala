package graft.functions

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the bitmap_or_agg aggregate: packing layout, partition/
  * duplicate invariance, null discipline, and the loud out-of-range
  * failure.
  */
class BitmapOrAggSpec extends AnyFunSuite with SparkSpec with Matchers {

  import spark.implicits._

  private def bitmap(ps: Seq[java.lang.Long], m: Int, parts: Int): Seq[Long] =
    ps.toDF("p").repartition(parts)
      .agg(BitmapOrAgg.bitmapOrAgg(org.apache.spark.sql.functions.col("p"), m))
      .head().getSeq[Long](0)

  test("packing layout: position p sets bit p%64 of word p/64") {
    val got = bitmap(Seq[java.lang.Long](0L, 1L, 63L, 64L, 127L, 130L), 192, 3)
    got should have length 3
    got(0) shouldBe ((1L << 0) | (1L << 1) | (1L << 63))
    got(1) shouldBe ((1L << 0) | (1L << 63))
    got(2) shouldBe (1L << 2)
  }

  test("partitioning and duplicates are invisible; nulls are skipped") {
    val ps = Seq[java.lang.Long](5L, 5L, 5L, 70L, null, 70L, 190L)
    val a = bitmap(ps, 192, 1)
    val b = bitmap(ps, 192, 7)
    val c = bitmap(ps.distinct.filter(_ != null), 192, 4)
    a shouldBe b
    a shouldBe c
  }

  test("an empty input aggregates to the all-zero bitmap") {
    bitmap(Seq.empty[java.lang.Long], 128, 2) shouldBe Seq(0L, 0L)
  }

  test("out-of-range positions fail loudly, never wrap") {
    val e = intercept[org.apache.spark.SparkException] {
      bitmap(Seq[java.lang.Long](200L), 128, 1)
    }
    assert(e.getMessage.contains("bitmap_or_agg") ||
      Option(e.getCause).exists(_.getMessage.contains("bitmap_or_agg")), e.getMessage)
  }
}
