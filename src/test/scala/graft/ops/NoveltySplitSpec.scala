package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Structural pins for d64 (window novelty) and d65 (group-aware
  * split) beyond the hash oracle: the invariants that make them USEFUL
  * — exact dups score zero novelty, first occurrences partition the
  * window universe, and the group split is leakage-free by d48's own
  * audit definition.
  */
class NoveltySplitSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("d64: verbatim copies score 0, originals 10^6; first occurrences partition the windows") {
    // planted corpus: doc 2 is a verbatim copy of doc 1 (all windows
    // first-occur in 1); doc 3 shares nothing; doc 4 copies doc 3's
    // text with the LAST word changed — of its 5 windows only the final
    // one covers position 12, so novelty is exactly 1/5
    import spark.implicits._
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val b = (1 to 12).map(i => s"x$i").mkString(" ")
    val b2 = b.replace("x12", "y12")
    val planted = CorpusOps.noveltyOver(
        Seq((1L, a), (2L, a), (3L, b), (4L, b2)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("novelty_ppm")).toMap
    planted(1L) shouldBe 1000000L
    planted(2L) shouldBe 0L
    planted(3L) shouldBe 1000000L
    planted(4L) shouldBe 200000L

    // fixture invariants: ppm in range, and each distinct window has
    // exactly one first occurrence, so n_novel sums to the corpus-wide
    // distinct window count
    val nov = CorpusOps.d64Novelty(spark, sf001).persist()
    val rows = nov.collect()
    rows.length should be > 0
    all(rows.map(_.getAs[Long]("novelty_ppm"))) should (be >= 0L and be <= 1000000L)
    val totalNovel = nov.agg(sum(col("n_novel"))).head().getLong(0)
    val distinctWindows = graft.Tables.documents(spark, sf001)
      .select(explode(array_distinct(graft.functions.WordWindowMd5
        .wordWindowMd5(lower(trim(col("text"))), 8))).as("gh"))
      .agg(countDistinct(col("gh"))).head().getLong(0)
    totalNovel shouldBe distinctWindows
    nov.unpersist()
  }

  test("d65: fingerprint groups never straddle splits — the d48 audit is empty by construction") {
    val split = CorpusOps.d65GroupSplit(spark, sf001)
    val withFp = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), CorpusOps.fingerprint(col("text")).as("fp"))
      .join(split, "doc_id").persist()

    // one split per group
    withFp.groupBy(col("fp")).agg(countDistinct(col("split")).as("k"))
      .agg(max(col("k"))).head().getLong(0) shouldBe 1L

    // d48's leakage definition: a non-train doc whose group holds a
    // train member — must be empty here
    val trainGroups = withFp.filter(col("split") === "train").select(col("fp")).distinct()
    withFp.filter(col("split") =!= "train")
      .join(trainGroups, Seq("fp"), "left_semi").count() shouldBe 0L

    // the assignment still actually splits (all three classes present)
    withFp.select(col("split")).distinct().count() shouldBe 3L
    withFp.unpersist()
  }
}
