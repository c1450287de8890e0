package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins for the d67 Min-K% memorization screen
  * (`CorpusOps.minkScreenWith`) against an in-memory reference that
  * retrains the hashed add-one bigram LM, re-lists each document's
  * per-bigram score terms, and replays the ascending k-prefix average,
  * the global rank and the 5% suspect cut directly. The DuckDB oracle
  * covers one corpus; the property covers random ones: corpora with no
  * target documents, sub-2-token documents (excluded), repeated
  * bigrams, and rank ties broken by doc_id.
  */
class MinkScreenSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def bucketOf(s: String, m: Int): Int = (md5Prefix60(s) % m).toInt

  // the engine's integer bigram-bucket combine of the two 60-bit word
  // hashes (CorpusOps.bigramBucket, replayed)
  private def bigramBucketOf(a: String, b: String): Int =
    (((md5Prefix60(a) % 1048576L) * 1000003L + md5Prefix60(b) % 1048576L) %
      CorpusOps.PplBigramBuckets).toInt

  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split(" ", -1).toSeq

  private def minkRef(rows: Seq[(Long, Boolean, String)]): Set[(Long, Long, Long, Long, Long)] = {
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
        val terms = ws.zip(ws.drop(1)).map { case (a, b) =>
          CorpusOps.log2Fx(cb.getOrElse(bigramBucketOf(a, b), 0L) + 1) -
            CorpusOps.log2Fx(cu.getOrElse(bucketOf(a, Bu), 0L) + 256) +
            CorpusOps.PplTermOffset
        }.sorted
        val n = ws.length - 1L
        val k = math.max(1L, n / 5)
        val s = terms.take(k.toInt).sum
        (id, n, s / k * 1048576 + s % k * 1048576 / k)
      }
    }
    val nd = scored.size.toLong
    scored.sortBy { case (id, _, mink) => (-mink, id) }.zipWithIndex.map {
      case ((id, n, mink), i) =>
        val rk = i + 1L
        (id, n, mink, rk, if (rk <= (nd + 19) / 20) 1L else 0L)
    }.toSet
  }

  private val vocab = Gen.oneOf(
    "the", "a", "of", "cat", "sat", "mat", "und", "der", "le", "la",
    "datos", "train", "data", "x1", "x2")

  private val corpusGen: Gen[Seq[(Long, Boolean, String)]] = for {
    m <- Gen.choose(3, 50)
    ids <- Gen.listOfN(m, Gen.choose(0L, 100000L)).map(_.distinct)
    allTgt <- Gen.oneOf(0, 1, 2)
    rows <- Gen.sequence[Seq[(Long, Boolean, String)], (Long, Boolean, String)](
      ids.map { id =>
        for {
          t0 <- Gen.oneOf(true, false)
          nw <- Gen.frequency(1 -> Gen.choose(0, 1), 9 -> Gen.choose(2, 25))
          wsL <- Gen.listOfN(nw, vocab)
        } yield (id, if (allTgt == 0) t0 else allTgt == 2, wsL.mkString(" "))
      })
  } yield rows

  test("d67 core: bucket-decomposed Min-K% screen == in-memory replay on random corpora") {
    import spark.implicits._
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25),
      Prop.forAll(corpusGen) { rows =>
        val docs = rows.toDF("doc_id", "is_target", "text").repartition(7)
        val (bigWts, ctxWts) = CorpusOps.pplModel(docs)
        val got = CorpusOps.minkScreenWith(docs, bigWts, ctxWts)
          .as[(Long, Long, Long, Long, Long)].collect().toSet
        got == minkRef(rows)
      })
    assert(res.passed, res.status.toString)
  }

  test("d67 structure: a verbatim copy of training text outranks fresh text; suspects land on copies") {
    import spark.implicits._
    // the membership-inference setup: the LM trains on 10 identical
    // target docs; doc 100 is a VERBATIM held-out copy of that training
    // text (the memorized arrival the screen exists to catch), docs
    // 101-105 are fresh vocabulary the LM never saw. 16 scorable docs
    // -> exactly 1 suspect slot (ceil(16/20)); every bigram of the
    // memorized copy is maximally trained, so all 11 copies share one
    // mink_fx strictly above every fresh doc's, and the one suspect is
    // necessarily a copy (ties inside the copy set break by doc_id)
    val trainTxt = "the cat sat on the mat and the cat slept"
    val train = (1 to 10).map(i => (i.toLong, true, trainTxt))
    val memorized = Seq((100L, false, trainTxt))
    val fresh = (101 to 105).map(i => (i.toLong, false, "zq xw vv qq zz xx vv zq"))
    val docs = (train ++ memorized ++ fresh).toDF("doc_id", "is_target", "text")
    val (bigWts, ctxWts) = CorpusOps.pplModel(docs)
    val out = CorpusOps.minkScreenWith(docs, bigWts, ctxWts)
      .as[(Long, Long, Long, Long, Long)].collect()
    val copies = out.filter(r => r._1 <= 10L || r._1 == 100L)
    val freshOut = out.filter(_._1 >= 101L)
    copies.map(_._3).distinct should have size 1 // identical text, identical mink
    copies.map(_._3).head should be > freshOut.map(_._3).max
    out.count(_._5 == 1L) shouldBe 1
    assert(copies.exists(_._5 == 1L), "the suspect slot must land on a training copy")
    freshOut.foreach(r => r._5 shouldBe 0L)
  }

  test("d47/d67 fixed-point averages survive book-length documents (no int64 overflow)") {
    import spark.implicits._
    // 200k identical tokens: every bigram scores the same term t, so both
    // averages must equal exactly t * 2^20. The pre-split (sum * 2^20)
    // form overflows int64 near 140k bigrams of untrained vocabulary
    // (term ~2^26) and wrapped negative here — a memorized book-length
    // document would have slipped the d67 screen ranked least-suspect.
    val long = Array.fill(200000)("zq").mkString(" ")
    val docs = Seq((1L, false, long), (2L, true, "the cat sat"))
      .toDF("doc_id", "is_target", "text")
    val (bigWts, ctxWts) = CorpusOps.pplModel(docs)
    val t = bigWts(bigramBucketOf("zq", "zq")) -
      ctxWts((md5Prefix60("zq") % 256).toInt) + CorpusOps.PplTermOffset
    CorpusOps.pplScored(docs, bigWts, ctxWts)
      .filter($"doc_id" === 1L).head().getAs[Long]("avg_fx") shouldBe t * 1048576L
    CorpusOps.minkScored(docs, bigWts, ctxWts)
      .filter($"doc_id" === 1L).head().getAs[Long]("mink_fx") shouldBe t * 1048576L
  }

  test("d67 invariant: the worst-k average never exceeds the full average (mink_fx <= avg_fx)") {
    import spark.implicits._
    val rows = (1 to 30).map(i => (i.toLong, i % 2 == 0,
      Seq.fill(3 + i % 7)(Seq("the", "cat", "sat", "zq")(i % 4)).mkString(" ")))
    val docs = rows.toDF("doc_id", "is_target", "text")
    val (bigWts, ctxWts) = CorpusOps.pplModel(docs)
    val mink = CorpusOps.minkScored(docs, bigWts, ctxWts)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val avg = CorpusOps.pplScored(docs, bigWts, ctxWts)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    mink.keySet shouldBe avg.keySet
    mink.foreach { case (id, m) => assert(m <= avg(id), s"doc $id: mink $m > avg ${avg(id)}") }
  }
}
