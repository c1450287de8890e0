package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property pins for the d45 DSIR selection core: `CorpusOps.log2Fx`
  * against exact binary-log identities, and `CorpusOps.dsirSelectOver`
  * against an in-memory reference that recomputes hashed-bucket counts,
  * fixed-point log-ratio weights, per-document scores and the top-N/4
  * selection directly. The DuckDB oracle covers one corpus; these cover
  * the structural edges on random ones: all-target and no-target
  * corpora, empty documents, single-token documents, repeated tokens,
  * score ties, and score distributions straddling the rank-bucket
  * boundaries of the bucketRank decomposition.
  */
class DsirPropSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val B = 256

  /** The engines' feature hash: the shared 60-bit md5 prefix mod the
    * bucket count.
    */
  private def bucketOf(w: String): Int = (md5Prefix60(w) % B).toInt

  private def tokens(text: String): Seq[String] =
    text.trim.toLowerCase.split(" ", -1).toSeq

  /** In-memory replay: bucket counts -> fixed-point weights -> scores ->
    * top-(n/4) by (score desc, doc_id).
    */
  private def dsirRef(rows: Seq[(Long, Boolean, String)]): Set[(Long, Long, Long)] = {
    val all = rows.flatMap { case (_, tgt, text) => tokens(text).map(w => (bucketOf(w), tgt)) }
    val r = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val t = all.filter(_._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val (lT, lR) = (CorpusOps.log2Fx(all.count(_._2).toLong + B),
      CorpusOps.log2Fx(all.size.toLong + B))
    def wt(f: Int): Long =
      (CorpusOps.log2Fx(t.getOrElse(f, 0L) + 1) - lT) -
        (CorpusOps.log2Fx(r.getOrElse(f, 0L) + 1) - lR)
    val scored = rows.map { case (id, _, text) =>
      (id, tokens(text).map(w => wt(bucketOf(w))).sum)
    }
    val k = rows.size / 4
    scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
      .map { case ((id, s), i) => (id, s, i + 1L) }.toSet
  }

  private val vocab = Gen.oneOf(
    "the", "a", "of", "cat", "dog", "und", "der", "le", "la", "datos",
    "modelo", "train", "data", "quality", "web", "x1", "x2", "x3")

  private val corpusGen: Gen[Seq[(Long, Boolean, String)]] = for {
    m <- Gen.choose(4, 60)
    ids <- Gen.listOfN(m, Gen.choose(0L, 100000L)).map(_.distinct)
    rows <- Gen.sequence[Seq[(Long, Boolean, String)], (Long, Boolean, String)](
      ids.map { id =>
        for {
          tgt <- Gen.oneOf(true, false)
          nw <- Gen.frequency(1 -> Gen.const(0), 9 -> Gen.choose(1, 30))
          ws <- Gen.listOfN(nw, vocab)
        } yield (id, tgt, ws.mkString(" "))
      })
  } yield rows

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("log2Fx: exact on powers of two, monotone, floor of 2^20 * log2") {
    for (e <- 0 to 40) CorpusOps.log2Fx(1L << e) shouldBe e.toLong << 20
    val ns = Seq(1L, 2L, 3L, 5L, 7L, 100L, 1000L, 123457L, (1L << 40) - 1)
    for (n <- ns) {
      val fx = CorpusOps.log2Fx(n)
      val exact = math.log(n.toDouble) / math.log(2.0)
      (fx / 1048576.0) shouldBe exact +- 2e-6 // floor quantization + fp slack
    }
    ns.sliding(2).foreach { case Seq(a, b) =>
      assert(CorpusOps.log2Fx(a) < CorpusOps.log2Fx(b))
    }
  }

  test("d45 core: bucket-decomposed DSIR selection == in-memory replay on random corpora") {
    import spark.implicits._
    check(Prop.forAll(corpusGen) { rows =>
      val got = CorpusOps.dsirSelectOver(
        rows.toDF("doc_id", "is_target", "text").repartition(7))
        .as[(Long, Long, Long)].collect().toSet
      got == dsirRef(rows)
    })
  }
}
