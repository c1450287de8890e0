package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The Count-Min kernel's whole contract: counters equal the in-memory
  * replay under any partitioning (addition is merge-order-free — what
  * lets d72/d73 carry full hash oracles where an order-dependent
  * heavy-hitter state could not), estimates are one-sided, and the
  * geometry/sign preconditions fail loudly.
  */
class CmsAggSpec extends AnyFunSuite with SparkSpec with Matchers {
  import CmsAgg.cmsAgg

  /** In-memory replay of the sketch: row j's bucket is the j-th
    * log2(width)-bit slice of the hash.
    */
  private def replay(data: Seq[(Long, Long)], width: Int, depth: Int): Seq[Long] = {
    val bits = java.lang.Integer.numberOfTrailingZeros(width)
    val buf = new Array[Long](depth * width)
    for ((h, w) <- data; j <- 0 until depth)
      buf(j * width + ((h >>> (bits * j)) & (width - 1)).toInt) += w
    buf.toSeq
  }

  test("cms_agg == in-memory replay, any partitioning") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(4000)((rnd.nextLong() >>> 4, rnd.nextInt(50).toLong + 1L))
    val expected = replay(data, 64, 3)
    import spark.implicits._
    for (parts <- Seq(1, 7, 32)) {
      val got = data.toDF("h", "c").repartition(parts)
        .agg(cmsAgg(col("h"), col("c"), 64, 3)).head().getSeq[Long](0)
      got shouldBe expected
    }
  }

  test("weighted update equals repeated unit updates") {
    import spark.implicits._
    val weighted = Seq((100L, 5L), (200L, 3L))
    val units = Seq.fill(5)((100L, 1L)) ++ Seq.fill(3)((200L, 1L))
    val a = weighted.toDF("h", "c").agg(cmsAgg(col("h"), col("c"), 16, 2)).head().getSeq[Long](0)
    val b = units.toDF("h", "c").agg(cmsAgg(col("h"), col("c"), 16, 2)).head().getSeq[Long](0)
    a shouldBe b
  }

  test("point estimate (min over rows) is one-sided: est >= exact, exact when collision-free") {
    // width 16 forces collisions among 40 distinct hashes; the estimate
    // may only ever OVERCOUNT, and is exact for any hash whose depth
    // cells carry no foreign mass — the bound d73's conservative-admit
    // direction rests on
    val rnd = new scala.util.Random(23)
    val data = Seq.fill(40)((rnd.nextLong() >>> 4, rnd.nextInt(20).toLong + 1L))
    val exact = data.groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).sum }
    val width = 16; val depth = 2; val bits = 4
    val cms = replay(data, width, depth)
    def est(h: Long): Long =
      (0 until depth).map(j => cms(j * width + ((h >>> (bits * j)) & (width - 1)).toInt)).min
    var sawExact = false
    for ((h, c) <- exact) {
      est(h) should be >= c
      if (est(h) == c) sawExact = true
    }
    sawExact shouldBe true
    // and the distributed kernel agrees with the replay that backed it
    import spark.implicits._
    val got = data.toDF("h", "c").repartition(5)
      .agg(cmsAgg(col("h"), col("c"), width, depth)).head().getSeq[Long](0)
    got shouldBe cms
  }

  test("null hash or weight rows are skipped, matching count(col)") {
    import spark.implicits._
    val df = Seq[(Option[Long], Option[Long])](
      (Some(1L), None), (None, Some(2L)), (Some(3L), Some(4L)))
      .toDF("h", "c")
    val got = df.agg(cmsAgg(col("h"), col("c"), 8, 1)).head().getSeq[Long](0)
    got shouldBe replay(Seq((3L, 4L)), 8, 1)
  }

  test("negative weight and negative hash fail loudly") {
    import spark.implicits._
    intercept[Exception] {
      Seq((1L, -2L)).toDF("h", "c").agg(cmsAgg(col("h"), col("c"), 8, 1)).head()
    }
    intercept[Exception] {
      Seq((-1L, 2L)).toDF("h", "c").agg(cmsAgg(col("h"), col("c"), 8, 1)).head()
    }
  }

  test("geometry preconditions: width a power of two, depth*log2(width) <= 60") {
    import spark.implicits._
    intercept[Exception] {
      Seq((1L, 1L)).toDF("h", "c").agg(cmsAgg(col("h"), col("c"), 48, 1)).head()
    }
    intercept[Exception] {
      Seq((1L, 1L)).toDF("h", "c").agg(cmsAgg(col("h"), col("c"), 4096, 6)).head()
    }
  }

  test("SQL registration: cms_agg(h, w, width, depth) on the SQL surface") {
    import spark.implicits._
    Seq((5L, 2L), (5L, 3L)).toDF("h", "c").createOrReplaceTempView("cms_in")
    val got = spark.sql("SELECT cms_agg(h, c, 16, 2) FROM cms_in")
      .head().getSeq[Long](0)
    got shouldBe replay(Seq((5L, 2L), (5L, 3L)), 16, 2)
    spark.catalog.dropTempView("cms_in")
  }
}
