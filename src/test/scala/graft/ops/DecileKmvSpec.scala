package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The KMV decile gate (d32_deciles_cutoff) is fully deterministic, so
  * this spec replays it IN MEMORY — bottom-k-by-md5 sample, integer-ceil
  * cutoff ranks, value-based assignment — and requires bit-equality, at
  * a k that truncates (the sketch path the sf0.01 gate can't reach with
  * only ~125 docs per language) and a k that doesn't. Then pins the
  * statistical quality of the truncating form against the exact ntile
  * deciles on the fixed corpus.
  */
class DecileKmvSpec extends AnyFunSuite with SparkSpec with Matchers {


  test("KMV deciles == in-memory replay at truncating and full k") {
    val docs = graft.Tables.documents(spark, sf001)
    // exact q_ppm per doc from the hash-oracled exact-decile query
    val scored = CorpusOps.d32QualityDeciles(spark, sf001)
      .select(col("doc_id"), col("lang"),
        round(col("quality") * 1000000).cast("long").as("q_ppm"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    for (k <- Seq(16, 4096)) {
      val expected = scored.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
        val sample = rows
          .map { case (id, _, ppm) => (md5Prefix60(id.toString), ppm) }
          .distinct.sorted.take(k).map(_._2).sorted
        val kk = sample.length
        val cuts = (1 to 9).map(i => sample(((i * kk + 9) / 10) - 1))
        rows.toSeq.map { case (id, _, ppm) =>
          (id, lang) -> (1L + cuts.count(ppm > _))
        }
      }
      val got = CorpusOps.qualityDecilesKmv(docs, k).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")) ->
          r.getAs[Long]("decile")).toMap
      got.size shouldBe scored.length
      expected.foreach { case (key, d) => assert(got(key) == d, s"doc $key k=$k") }
    }
  }

  test("truncating-k deciles stay near the exact ntile form on the fixed corpus") {
    val exact = CorpusOps.d32QualityDeciles(spark, sf001)
      .select(col("doc_id"), col("decile").as("exact_decile"))
    val joined = CorpusOps.qualityDecilesKmv(
        graft.Tables.documents(spark, sf001), k = 64)
      .join(exact, "doc_id")
      .select(col("decile"), col("exact_decile"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    all(joined.map(_._1)) should (be >= 1L and be <= 10L)
    // deterministic on the fixed corpus: a 64-element sample of ~125
    // docs/lang has rank error well under two bucket widths
    val off = joined.count { case (b, eb) => math.abs(b - eb) > 2 }
    off shouldBe 0
    val offByOne = joined.count { case (b, eb) => b != eb }
    assert(offByOne <= joined.length / 4,
      s"$offByOne of ${joined.length} docs moved more than expected")
  }
}
