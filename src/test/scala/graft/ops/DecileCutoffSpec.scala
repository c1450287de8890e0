package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** d32_deciles_cutoff has no oracle (sketch-chosen cutoff elements are
  * engine-discretionary), so this spec pins the contract the sketch DOES
  * make — `approx_percentile`'s rank-error guarantee (relative rank error
  * <= 1/accuracy, i.e. the value returned for quantile p is an actual
  * element whose rank is within eps = n/accuracy of p*n) — translated into
  * decile terms against the exact ntile form:
  *
  *  - NECESSARY: a doc whose tie group spans ranks [rmin, rmax] within its
  *    language (n docs) can receive approx decile b only if rmin lies
  *    within eps (+2 slack for rank-target rounding conventions) of the
  *    ideal decile-b rank interval ((b-1)*n/10, b*n/10]. Proof sketch: the
  *    doc's value v strictly exceeds cutoff c_{b-1} (an element of rank
  *    >= (b-1)n/10 - eps), forcing rmin past that rank; and v <= c_b (an
  *    element of rank <= b*n/10 + eps), capping rmin at it.
  *  - SUFFICIENT: a doc whose whole tie group sits a safe margin
  *    m = eps + 2 + 12 from every ideal boundary k*n/10 must get the SAME
  *    decile from both forms (12 covers ntile's remainder-bucket drift:
  *    ntile boundary B(b) = b*floor(n/10) + min(b, n mod 10) differs from
  *    b*n/10 by at most 9).
  *
  * Run at two accuracies: 50 (error genuinely observable at per-language
  * n ~ 100) and the production 10000.
  */
class DecileCutoffSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("cutoff deciles respect the sketch rank-error bound vs the exact ntile form") {
    val docs = graft.Tables.documents(spark, sf01)
    val exact = CorpusOps.d32QualityDeciles(spark, sf01)
      .select(col("doc_id"), col("decile").as("exact_decile"))

    for (accuracy <- Seq(50, 10000)) {
      // quality is q_ppm / 1e6 — strictly monotone, so ranks are identical
      val wOrd = Window.partitionBy("lang").orderBy("quality")
      val ranked = CorpusOps.qualityDecilesCutoff(docs, accuracy)
        .withColumn("rmin", rank().over(wOrd))
        // default RANGE frame: counts every row with quality <= current,
        // ties included = the tie group's max rank
        .withColumn("rmax", count(lit(1)).over(wOrd))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
        .join(exact, "doc_id")
        .select("doc_id", "lang", "decile", "exact_decile", "rmin", "rmax", "n")
        .collect()

      ranked.length shouldBe docs.count()
      ranked.foreach { r =>
        val (b, eb) = (r.getAs[Long]("decile"), r.getAs[Long]("exact_decile"))
        val (rmin, rmax) = (r.getAs[Int]("rmin").toDouble, r.getAs[Long]("rmax").toDouble)
        val n = r.getAs[Long]("n").toDouble
        val eps = n / accuracy + 2
        val doc = s"doc ${r.getAs[Long]("doc_id")} lang ${r.getAs[String]("lang")} " +
          s"n=$n rmin=$rmin rmax=$rmax decile=$b exact=$eb accuracy=$accuracy"
        assert(b >= 1 && b <= 10, doc)
        assert(rmin <= b * n / 10.0 + eps, s"rank above decile-$b ceiling: $doc")
        if (b >= 2) assert(rmin > (b - 1) * n / 10.0 - eps, s"rank below decile-$b floor: $doc")
        val m = eps + 12
        val safelyInside = (0 to 9).exists(k =>
          k * n / 10.0 + m < rmin && rmax <= (k + 1) * n / 10.0 - m)
        if (safelyInside)
          assert(b == eb, s"boundary-safe doc must agree with the exact form: $doc")
      }
    }
  }
}
