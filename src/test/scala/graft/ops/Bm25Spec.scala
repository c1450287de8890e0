package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins d54 BM25 against an independent in-memory replay of the exact
  * fixed-point arithmetic, plus the ranking properties that make BM25
  * BM25: rare terms dominate, repetition saturates (k1), and long
  * documents are penalized (b).
  */
class Bm25Spec extends AnyFunSuite with SparkSpec with Matchers {

  import spark.implicits._

  /** The reference: same Lucene-variant idf via CorpusOps.log2Fx, same
    * integer-floored avgdl, same all-integer scoring.
    */
  private def refBm25(docs: Seq[(Long, String)]): Seq[(Long, Long)] = {
    val q = CorpusOps.Bm25Query
    val toks = docs.map { case (id, t) => (id, t.trim.toLowerCase.split(" ", -1).toSeq) }
    val n = toks.size.toLong
    val t = toks.map(_._2.size.toLong).sum
    val a = t / n
    val idf = q.map { term =>
      val df = toks.count(_._2.contains(term)).toLong
      CorpusOps.log2Fx(2 * n + 2) - CorpusOps.log2Fx(2 * df + 1)
    }
    toks.map { case (id, ws) =>
      val dl = ws.size.toLong
      val score = q.zipWithIndex.map { case (term, i) =>
        val tf = ws.count(_ == term).toLong
        (idf(i) * 44 * a * tf) / (20 * a * tf + 6 * a + 18 * dl)
      }.sum
      (id, score)
    }
  }

  private val vocab = Array("the", "fast", "key", "order", "sort", "table",
    "scan", "merge", "dup", "spark", "join", "window", "stream", "data")

  test("d54 top-20 equals the in-memory fixed-point reference") {
    val rnd = new scala.util.Random(54)
    val docs = (0L until 100L).map(i =>
      (i, Seq.fill(5 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val got = CorpusOps.bm25Over(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = refBm25(docs).sortBy { case (id, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1L) }
    got.toSeq shouldBe want
  }

  test("repetition saturates: tf doubling gains less than score doubling") {
    // two docs, same length, one has 2x the query-term count — its score
    // must be higher but less than 2x (the k1 saturation)
    val pad = "x"
    val d1 = (1L, (Seq.fill(4)("dup") ++ Seq.fill(28)(pad)).mkString(" "))
    val d2 = (2L, (Seq.fill(8)("dup") ++ Seq.fill(24)(pad)).mkString(" "))
    val filler = (3L to 40L).map(i => (i, Seq.fill(32)(pad).mkString(" ")))
    val scores = refBm25(d1 +: d2 +: filler).toMap
    assert(scores(2L) > scores(1L))
    assert(scores(2L) < 2 * scores(1L), s"no saturation: ${scores(1L)} -> ${scores(2L)}")
  }

  test("length normalization: same tf in a longer document scores lower") {
    val d1 = (1L, (Seq.fill(2)("dup") ++ Seq.fill(30)("x")).mkString(" "))
    val d2 = (2L, (Seq.fill(2)("dup") ++ Seq.fill(94)("x")).mkString(" "))
    val filler = (3L to 40L).map(i => (i, Seq.fill(32)("x").mkString(" ")))
    val scores = refBm25(d1 +: d2 +: filler).toMap
    assert(scores(1L) > scores(2L), s"no length penalty: $scores")
  }

  test("rare terms outweigh common ones at equal tf") {
    // 'dup' in 2/40 docs vs 'spark' in 30/40: one occurrence of each in
    // otherwise-identical docs — the rare-term doc must rank higher
    val d1 = (1L, ("dup " + Seq.fill(31)("x").mkString(" ")))
    val d2 = (2L, ("spark " + Seq.fill(31)("x").mkString(" ")))
    val sparky = (3L to 31L).map(i => (i, ("spark " + Seq.fill(31)("x").mkString(" "))))
    val dupy = Seq((32L, ("dup " + Seq.fill(31)("x").mkString(" "))))
    val filler = (33L to 40L).map(i => (i, Seq.fill(32)("x").mkString(" ")))
    val scores = refBm25(Seq(d1, d2) ++ sparky ++ dupy ++ filler).toMap
    assert(scores(1L) > scores(2L), s"rare term not favored: $scores")
  }

  test("d54 plans a TakeOrderedAndProject, no corpus-wide shuffle") {
    val p = graft.SparkEntry.queries("d54_bm25")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"scoring is a zero-shuffle projection:\n$p")
  }
}
