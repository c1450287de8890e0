package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The KMV primitive's whole contract: the k lexicographically-smallest
  * DISTINCT (h, v) pairs, ascending, independent of partitioning and
  * merge order — that independence is what lets the d32/q_approx_stats
  * gates carry full hash oracles where approx_percentile/HLL cannot.
  */
class BottomKPairsSpec extends AnyFunSuite with SparkSpec with Matchers {
  import BottomKPairs.bottomKPairs

  private def pairsOf(rows: Array[Row]): Seq[(Long, Long)] =
    rows.head.getSeq[Row](0).map(r => (r.getLong(0), r.getLong(1)))

  test("bottom_k_pairs == in-memory sorted-distinct take(k), any partitioning") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(5000)((rnd.nextLong() >>> 4, rnd.nextInt(100).toLong)) ++
      Seq.fill(500)((42L, 7L)) // a heavy duplicate pair must collapse
    val expected = data.distinct.sorted.take(257)
    import spark.implicits._
    for (parts <- Seq(1, 7, 64)) {
      val got = pairsOf(data.toDF("h", "v").repartition(parts)
        .agg(bottomKPairs(col("h"), col("v"), 257)).collect())
      got shouldBe expected
    }
  }

  test("k larger than the distinct universe returns the whole universe") {
    import spark.implicits._
    val data = Seq((3L, 1L), (1L, 2L), (3L, 1L), (2L, 9L))
    val got = pairsOf(data.toDF("h", "v")
      .agg(bottomKPairs(col("h"), col("v"), 100)).collect())
    got shouldBe Seq((1L, 2L), (2L, 9L), (3L, 1L))
  }

  test("null in either column is skipped, matching count(col)") {
    import spark.implicits._
    val df = Seq[(Option[Long], Option[Long])](
      (Some(1L), None), (None, Some(2L)), (Some(5L), Some(6L)))
      .toDF("h", "v")
    val got = pairsOf(df.agg(bottomKPairs(col("h"), col("v"), 10)).collect())
    got shouldBe Seq((5L, 6L))
  }

  test("ties on h are ordered by v (full pair ordering, not hash-only)") {
    import spark.implicits._
    val data = Seq((1L, 9L), (1L, 3L), (1L, 5L), (2L, 0L))
    val got = pairsOf(data.toDF("h", "v")
      .agg(bottomKPairs(col("h"), col("v"), 2)).collect())
    got shouldBe Seq((1L, 3L), (1L, 5L))
  }

  test("registered on the SQL surface with a literal k") {
    import spark.implicits._
    Seq((4L, 1L), (2L, 8L), (9L, 9L)).toDF("h", "v")
      .createOrReplaceTempView("bkp_in")
    val got = pairsOf(
      spark.sql("SELECT bottom_k_pairs(h, v, 2) FROM bkp_in").collect())
    got shouldBe Seq((2L, 8L), (4L, 1L))
  }
}
