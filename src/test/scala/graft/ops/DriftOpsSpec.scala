package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins for the drifting-target operators (s25 drift mix / s26 LM
  * refresh) against in-memory replays of the one-epoch-lag recurrence:
  * the id axis splits into `CorpusOps.DriftEpochs` windows and window
  * e's model derives from windows strictly before e. The DuckDB oracle
  * covers one corpus; the properties cover random ones (single-lang
  * corpora, empty histories, never-seen languages, sub-2-token docs).
  */
class DriftOpsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val E = CorpusOps.DriftEpochs.toInt

  // === s25 replay ======================================================

  private def driftRef(rows: Seq[(Long, String)]): Set[(Long, String, Long)] = {
    val w = rows.map(_._1).max / E + 1
    val langs = rows.map(_._2).distinct.sorted
    val counts = rows.groupBy { case (id, l) => (id / w, l) }.view.mapValues(_.size.toLong).toMap
    val cum = scala.collection.mutable.Map(langs.map(_ -> 0L): _*)
    val p = scala.collection.mutable.Map.empty[(Long, String), Long]
    for (e <- 0 until E) {
      val ctot = cum.values.sum
      val s = langs.map(l => l -> (if (cum(l) > 0)
        math.floor(math.sqrt(cum(l).toDouble) * 1000000).toLong else 0L)).toMap
      val stot = s.values.sum
      langs.foreach { l =>
        p((e.toLong, l)) = if (cum(l) == 0 || stot == 0) 1048576L
          else math.min(1048576L, s(l) * 524288L / stot * ctot / cum(l))
      }
      langs.foreach(l => cum(l) += counts.getOrElse((e.toLong, l), 0L))
    }
    rows.flatMap { case (id, l) =>
      val draw = md5Prefix60(s"$id:dmix") % 1048576L
      if (draw < p((id / w, l))) Some((id, l, id / w)) else None
    }.toSet
  }

  test("s25 core: schedule + admission == in-memory one-epoch-lag replay on random corpora") {
    import spark.implicits._
    val gen = for {
      m <- Gen.choose(5, 120)
      nl <- Gen.choose(1, 4)
      ids <- Gen.listOfN(m, Gen.choose(0L, 5000L)).map(_.distinct)
      rows <- Gen.sequence[Seq[(Long, String)], (Long, String)](ids.map { id =>
        Gen.oneOf(Seq("aa", "bb", "cc", "dd").take(nl)).map(l => (id, l))
      })
    } yield rows
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(gen) { rows =>
        val docs = rows.toDF("doc_id", "lang").repartition(5)
        val got = CorpusOps.driftMixAdmit(docs, CorpusOps.driftMixScheduleOver(docs))
          .as[(Long, String, Long)].collect().toSet
        got == driftRef(rows)
      })
    assert(res.passed, res.status.toString)
  }

  test("s25 structure: epoch 0 admits everything; the dominant language throttles toward its tempered share") {
    import spark.implicits._
    // 90/10 mixture spread uniformly across the id axis: lang 'aa' is
    // over-represented (raw share far above its sqrt-tempered share),
    // 'bb' is rare — the rebalance must throttle 'aa' in trained epochs
    // and admit 'bb' fully (its tempered target exceeds its arrivals)
    val rows = (0L until 1600L).map(i => (i, if (i % 10 < 9) "aa" else "bb"))
    val docs = rows.toDF("doc_id", "lang")
    val sched = CorpusOps.driftMixScheduleOver(docs)
    val admitted = CorpusOps.driftMixAdmit(docs, sched)
      .as[(Long, String, Long)].collect()
    val w = 1599L / E + 1
    admitted.count(_._3 == 0L) shouldBe rows.count(_._1 / w == 0L) // epoch 0: all
    val laterAa = admitted.filter(r => r._3 > 0L && r._2 == "aa").length.toDouble /
      rows.count(r => r._1 / w > 0L && r._2 == "aa")
    val laterBb = admitted.filter(r => r._3 > 0L && r._2 == "bb").length.toDouble /
      rows.count(r => r._1 / w > 0L && r._2 == "bb")
    laterBb shouldBe 1.0 // tempered target > arrivals: rare lang fully admitted
    laterAa should be < 0.55 // ~(3/4)·(10/9)/2 ≈ 0.42 expected
  }

  test("s25 determinism: the admitted set is independent of micro-batch chunking") {
    val one = graft.streaming.StreamingQueries
      .s25StreamDriftMix(spark, sf001, maxFilesPerTrigger = Some(1))
      .collect().map(_.toSeq).toSet
    val all = graft.streaming.StreamingQueries
      .s25StreamDriftMix(spark, sf001)
      .collect().map(_.toSeq).toSet
    one shouldBe all
    all should not be empty
  }

  // === s26 replay ======================================================

  private def bigramBucketOf(a: String, b: String): Int =
    (((md5Prefix60(a) % 1048576L) * 1000003L + md5Prefix60(b) % 1048576L) %
      CorpusOps.PplBigramBuckets).toInt

  private def toks(t: String): Seq[String] = t.trim.toLowerCase.split(" ", -1).toSeq

  private def refreshRef(rows: Seq[(Long, Boolean, String)]): Set[(Long, Long, Long, Long)] = {
    val w = rows.map(_._1).max / E + 1
    // per-epoch target-slice bucket counts
    def bigramsOf(t: String): Seq[(Int, Int)] = {
      val ws = toks(t)
      ws.zip(ws.drop(1)).map { case (a, b) =>
        (bigramBucketOf(a, b), (md5Prefix60(a) % 256).toInt)
      }
    }
    val perB = scala.collection.mutable.Map.empty[(Long, Int), Long].withDefaultValue(0L)
    val perC = scala.collection.mutable.Map.empty[(Long, Int), Long].withDefaultValue(0L)
    rows.filter(_._2).foreach { case (id, _, t) =>
      bigramsOf(t).foreach { case (hb, hc) =>
        perB((id / w, hb)) += 1; perC((id / w, hc)) += 1
      }
    }
    def cumB(e: Long, hb: Int): Long = (0L until e).map(perB(_, hb)).sum
    def cumC(e: Long, hc: Int): Long = (0L until e).map(perC(_, hc)).sum
    rows.flatMap { case (id, _, t) =>
      val ws = toks(t)
      if (ws.length < 2) None else Some {
        val e = id / w
        val terms = bigramsOf(t).map { case (hb, hc) =>
          CorpusOps.log2Fx(cumB(e, hb) + 1) - CorpusOps.log2Fx(cumC(e, hc) + 256) +
            CorpusOps.PplTermOffset
        }
        val n = ws.length - 1L
        val s = terms.sum
        (id, e, n, s / n * 1048576L + s % n * 1048576L / n)
      }
    }.toSet
  }

  test("s26 core: epoch-dispatched scoring == in-memory cumulative-LM replay on random corpora") {
    import spark.implicits._
    val vocab = Gen.oneOf("the", "a", "cat", "sat", "und", "der", "le", "zq", "x1", "x2")
    val gen = for {
      m <- Gen.choose(3, 60)
      ids <- Gen.listOfN(m, Gen.choose(0L, 3000L)).map(_.distinct)
      rows <- Gen.sequence[Seq[(Long, Boolean, String)], (Long, Boolean, String)](
        ids.map { id =>
          for {
            tgt <- Gen.oneOf(true, false)
            nw <- Gen.frequency(1 -> Gen.choose(0, 1), 9 -> Gen.choose(2, 20))
            wsL <- Gen.listOfN(nw, vocab)
          } yield (id, tgt, wsL.mkString(" "))
        })
    } yield rows
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(gen) { rows =>
        val docs = rows.toDF("doc_id", "is_target", "text").repartition(5)
        val got = CorpusOps.lmRefreshScored(docs, CorpusOps.lmRefreshModelOver(docs))
          .as[(Long, Long, Long, Long)].collect().toSet
        got == refreshRef(rows)
      })
    assert(res.passed, res.status.toString)
  }

  test("s26 structure: epoch 0 scores the add-one prior; trained text scores strictly higher once its window closes") {
    import spark.implicits._
    val t = "the cat sat on the mat"
    // width: max id 3199 -> w = 200; ids 0..199 land in epoch 0,
    // 200.. in epoch 1, etc. Train on 20 epoch-0 copies; the SAME text
    // arrives again in epoch 1 (id 250) and untrained text too
    val rows = (0L until 20L).map(i => (i, true, t)) ++
      Seq((250L, false, t), (251L, false, "zq xw vv qq zz xx"), (3199L, false, t))
    val docs = rows.toDF("doc_id", "is_target", "text")
    val out = CorpusOps.lmRefreshScored(docs, CorpusOps.lmRefreshModelOver(docs))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // every epoch-0 doc scores the prior constant: each bigram term is
    // 0 - log2fx(256) + 2^26, averaged exactly
    val prior = (0L - CorpusOps.log2Fx(256) + CorpusOps.PplTermOffset) * 1048576L
    (0L until 20L).foreach(i => out(i)._4 shouldBe prior)
    out(250L)._2 shouldBe 1L
    out(250L)._4 should be > prior // the refreshed LM has seen this text
    out(251L)._4 should be < out(250L)._4 // untrained vocabulary scores lower
    out(3199L)._4 shouldBe out(250L)._4 // same text, same cumulative history (nothing new trained after epoch 0)
  }
}
