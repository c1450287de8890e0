package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins d57's report-card arithmetic on a corpus with KNOWN health:
  * planted exact dups, a known language mix, and hand-computable
  * quality — every ppm metric must come out exactly.
  */
class CorpusReportSpec extends AnyFunSuite with SparkSpec with Matchers {

  import spark.implicits._

  test("planted dup rates, language shares, and token totals come out ppm-exact") {
    // source A: 4 docs, 2 are exact dups (word-set identity), 3 en ->
    // dup_ppm = 250000, en_ppm = 750000. source B: 2 distinct docs, 0 en.
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "A"),
      (2L, "gamma beta alpha alpha", "de", "A"), // same word SET as doc 1
      (3L, "delta epsilon", "en", "A"),
      (4L, "zeta eta theta iota", "en", "A"),
      (5L, "kappa lambda", "fr", "B"),
      (6L, "mu nu xi", "es", "B")
    ).toDF("doc_id", "text", "lang", "source")
    val out = CorpusOps.corpusReportOver(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    a.getLong(1) shouldBe 4L           // n_docs
    a.getLong(2) shouldBe 3L           // n_unique (docs 1+2 share a fingerprint)
    a.getLong(3) shouldBe 250000L      // dup_ppm = 1e6 * 1/4
    a.getLong(4) shouldBe (3L + 4L + 2L + 4L) // total_tokens
    a.getLong(6) shouldBe 750000L      // en_ppm = 1e6 * 3/4
    val b = out("B")
    b.getLong(1) shouldBe 2L
    b.getLong(2) shouldBe 2L
    b.getLong(3) shouldBe 0L
    b.getLong(6) shouldBe 0L
    // mean quality: replay d11's exact formula per doc, integer-divide
    def qppm(text: String): Long = {
      val ws = text.split(" ", -1)
      val n = ws.length.toLong
      val stop = ws.count(Set("the", "a", "of")).toLong
      val len = ws.map(_.length.toLong).sum
      (1000000L * (8 * n * math.min(n, 100) + 600 * (n - stop) +
        75 * math.min(8 * n, len))) / (2000 * n)
    }
    a.getLong(5) shouldBe Seq("alpha beta gamma", "gamma beta alpha alpha",
      "delta epsilon", "zeta eta theta iota").map(qppm).sum / 4
  }

  test("d57 on the corpus agrees source-by-source with its building blocks") {
    val report = CorpusOps.d57CorpusReport(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = graft.Tables.documents(spark, sf001)
    val nBySource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    report.keySet shouldBe nBySource.keySet
    report.foreach { case (src, r) => r.getLong(1) shouldBe nBySource(src) }
    // dup_ppm coheres with d1: corpus-wide canonicals <= per-source uniques
    val canon = CorpusOps.d1ExactDedup(spark, sf001)
      .filter($"doc_id" === $"canonical_id").count()
    assert(report.values.map(_.getLong(2)).sum >= canon)
  }
}
