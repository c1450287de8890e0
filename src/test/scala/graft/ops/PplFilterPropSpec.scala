package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property pin for the d47 perplexity-tercile core
  * (`CorpusOps.pplFilterOver`) against an in-memory reference that
  * retrains the hashed add-one bigram LM and replays scoring, the
  * offset-shifted integer average and the tercile split directly. The
  * DuckDB oracle covers one corpus; this covers random ones: corpora
  * with no target documents (every weight falls to the smoothed floor),
  * all-target corpora, sub-2-token documents (excluded from output),
  * repeated bigrams, and average ties broken by doc_id.
  */
class PplFilterPropSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def bucketOf(s: String, m: Int): Int = (md5Prefix60(s) % m).toInt

  // the engine's integer bigram-bucket combine of the two 60-bit word
  // hashes (CorpusOps.bigramBucket, replayed)
  private def bigramBucketOf(a: String, b: String): Int =
    (((md5Prefix60(a) % 1048576L) * 1000003L + md5Prefix60(b) % 1048576L) %
      CorpusOps.PplBigramBuckets).toInt

  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split(" ", -1).toSeq

  private def pplRef(rows: Seq[(Long, Boolean, String)]): Set[(Long, Long, Long, String)] = {
    val Bb = CorpusOps.PplBigramBuckets
    val Bu = 256
    val tgt = rows.filter(_._2).flatMap { case (_, _, t) =>
      val ws = toks(t); ws.zip(ws.drop(1))
    }
    val cb = tgt.groupBy { case (a, b) => bigramBucketOf(a, b) }.view.mapValues(_.size.toLong).toMap
    val cu = tgt.groupBy { case (a, _) => bucketOf(a, Bu) }.view.mapValues(_.size.toLong).toMap
    val scored = rows.flatMap { case (id, _, t) =>
      val ws = toks(t)
      if (ws.length < 2) None else Some {
        val score = ws.zip(ws.drop(1)).map { case (a, b) =>
          CorpusOps.log2Fx(cb.getOrElse(bigramBucketOf(a, b), 0L) + 1) -
            CorpusOps.log2Fx(cu.getOrElse(bucketOf(a, Bu), 0L) + 256) +
            CorpusOps.PplTermOffset
        }.sum
        val n = ws.length - 1L
        (id, n, score / n * 1048576 + score % n * 1048576 / n)
      }
    }
    val nd = scored.size.toLong
    scored.sortBy { case (id, _, avg) => (-avg, id) }.zipWithIndex.map {
      case ((id, n, avg), i) =>
        val rk = i + 1
        val b = if (rk <= nd / 3) "head" else if (rk <= 2 * nd / 3) "middle" else "tail"
        (id, n, avg, b)
    }.toSet
  }

  private val vocab = Gen.oneOf(
    "the", "a", "of", "cat", "sat", "mat", "und", "der", "le", "la",
    "datos", "train", "data", "x1", "x2")

  private val corpusGen: Gen[Seq[(Long, Boolean, String)]] = for {
    m <- Gen.choose(3, 50)
    ids <- Gen.listOfN(m, Gen.choose(0L, 100000L)).map(_.distinct)
    allTgt <- Gen.oneOf(0, 1, 2) // 0: mixed, 1: none target, 2: all target
    rows <- Gen.sequence[Seq[(Long, Boolean, String)], (Long, Boolean, String)](
      ids.map { id =>
        for {
          t0 <- Gen.oneOf(true, false)
          nw <- Gen.frequency(1 -> Gen.choose(0, 1), 9 -> Gen.choose(2, 25))
          wsL <- Gen.listOfN(nw, vocab)
        } yield (id, if (allTgt == 0) t0 else allTgt == 2, wsL.mkString(" "))
      })
  } yield rows

  test("d47 core: bucket-decomposed perplexity terciles == in-memory replay on random corpora") {
    import spark.implicits._
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25),
      Prop.forAll(corpusGen) { rows =>
        val got = CorpusOps.pplFilterOver(
          rows.toDF("doc_id", "is_target", "text").repartition(7))
          .as[(Long, Long, Long, String)].collect().toSet
        got == pplRef(rows)
      })
    assert(res.passed, res.status.toString)
  }

  test("d47 structure: target-heavy repeated bigrams land in head, unseen-vocab docs in tail") {
    import spark.implicits._
    // 9 scorable docs -> terciles of 3; docs built so the LM makes their
    // order unambiguous: target docs repeat 'the cat sat', the tail docs
    // use vocabulary the target LM never saw
    val common = (1 to 6).map(i => (i.toLong, true, "the cat sat the cat sat the cat"))
    val rare = (7 to 9).map(i => (i.toLong, false, "zq xw vv zq xw"))
    val out = CorpusOps.pplFilterOver((common ++ rare).toDF("doc_id", "is_target", "text"))
      .as[(Long, Long, Long, String)].collect().toMap2
    (1 to 3).foreach(i => out(i.toLong)._3 shouldBe "head")
    (7 to 9).foreach(i => out(i.toLong)._3 shouldBe "tail")
  }

  private implicit class Map2Ops(rows: Array[(Long, Long, Long, String)]) {
    def toMap2: Map[Long, (Long, Long, String)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
