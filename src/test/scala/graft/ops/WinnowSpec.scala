package graft.ops

import java.security.MessageDigest

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins d52/d53 winnowing (Schleimer–Wilkerson–Aiken) against an
  * independent in-memory reference: selection equality on random
  * corpora, the rightmost-tiebreak rule, the sketch-size bounds, the
  * detection GUARANTEE for shared runs at the documented threshold, and
  * the zero-shuffle plan shape of the sketch itself.
  */
class WinnowSpec extends AnyFunSuite with SparkSpec with Matchers {

  import spark.implicits._

  private val W = 4  // CorpusOps.WinnowW
  private val G = 8  // CorpusOps.SpanW
  private val Cap = 1L << 20

  /** Independent reference: same normalization, hash, key packing, and
    * window-min selection as the operator, in plain Scala collections.
    */
  private def refWinnow(text: String): Seq[(Long, Long)] = {
    val ws = text.trim.toLowerCase.split(" ", -1)
    if (ws.length < G) return Seq.empty
    val md = MessageDigest.getInstance("MD5")
    val ghs = (0 to ws.length - G).map { i =>
      val d = md.digest(ws.slice(i, i + G).mkString(" ").getBytes("UTF-8"))
      var v = 0L
      (0 until 8).foreach(b => v = (v << 8) | (d(b) & 0xffL))
      v >>> 4
    }
    if (ghs.length < W) return Seq.empty
    val keys = ghs.zipWithIndex.map { case (g, i) => g - (g % Cap) + (Cap - 1 - i) }
    (0 to keys.length - W).map(i => keys.slice(i, i + W).min).distinct
      .map { k => val pos = Cap - 1 - (k % Cap); (pos, ghs(pos.toInt)) }
  }

  private val vocab = Array("the", "fast", "key", "order", "sort", "table",
    "scan", "merge", "part", "window", "small", "hash", "join", "batch",
    "stream", "spark", "dup", "row", "data", "value")

  private def soup(rnd: scala.util.Random, n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")

  test("the fused WinnowMd5 kernel is bit-identical to the composed column form") {
    // random corpora + the real sf0.001 table: the kernel's deque
    // selection must reproduce the transform/sequence/slice/array_min
    // reference exactly — same packed keys, same distinct minima
    val rnd = new scala.util.Random(314)
    val docs = (0L until 80L).map(i => (i, soup(rnd, rnd.nextInt(90))))
      .toDF("doc_id", "text")
      .union(graft.Tables.documents(spark, sf001).select("doc_id", "text")
        .withColumn("doc_id", $"doc_id" + 1000000L))
    val cap = 1L << 20
    val got = CorpusOps.winnowSelected(docs)
      .select($"doc_id", org.apache.spark.sql.functions.explode($"sel").as("sg"))
      .select($"doc_id", $"sg.pos", $"sg.gh")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = CorpusOps.winnowSelectedComposed(docs)
      .select($"doc_id", $"ghs", org.apache.spark.sql.functions.explode($"selkeys").as("key"))
      .collect().map { r =>
        val pos = cap - 1 - java.lang.Math.floorMod(r.getLong(2), cap)
        (r.getLong(0), pos, r.getSeq[Long](1)(pos.toInt))
      }.toSet
    got shouldBe want
    assert(want.nonEmpty)
  }

  test("d52 selection equals the in-memory reference on random corpora") {
    val rnd = new scala.util.Random(421)
    val docs = (0L until 60L).map(i => (i, soup(rnd, rnd.nextInt(60))))
    val got = CorpusOps.winnowOver(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = docs.flatMap { case (id, t) =>
      refWinnow(t).map { case (p, g) => (id, p, g) }
    }.toSet
    got shouldBe want
    assert(want.nonEmpty, "degenerate test corpus: nothing selected")
  }

  test("all-identical grams select the rightmost position of every window") {
    // one repeated word: every 8-gram hashes identically, so the packed
    // key strictly decreases with position and each window's minimum is
    // its LAST gram — selected positions are exactly {W-1 .. n_grams-1}
    val n = 20
    val doc = Seq((1L, Seq.fill(n)("dup").mkString(" "))).toDF("doc_id", "text")
    val got = CorpusOps.winnowOver(doc).collect().map(_.getLong(1)).sorted
    val nGrams = n - G + 1
    got shouldBe ((W - 1).toLong until nGrams.toLong).toArray
  }

  test("sketch size is within the winnowing bounds") {
    val rnd = new scala.util.Random(77)
    val docs = (0L until 40L).map(i => (i, soup(rnd, 20 + rnd.nextInt(80))))
    CorpusOps.winnowOver(docs.toDF("doc_id", "text"))
      .groupBy("doc_id").count().collect().foreach { r =>
        val n = docs(r.getLong(0).toInt)._2.split(" ", -1).length
        val windows = n - G + 1 - W + 1
        assert(r.getLong(1) <= windows, s"more selections than windows: $r")
        assert(r.getLong(1) >= (windows + W - 1) / W,
          s"a selection can cover at most $W windows: $r")
      }
  }

  test("documents under the guarantee threshold produce no fingerprints") {
    val docs = Seq((1L, soup(new scala.util.Random(5), G + W - 2)))
      .toDF("doc_id", "text")
    CorpusOps.winnowOver(docs).count() shouldBe 0L
  }

  test("d53 guarantee: a shared run of W+G-1 words is always detected") {
    val rnd = new scala.util.Random(99)
    // planted shared runs sit at DIFFERENT offsets in each member — the
    // position-shift invariance of the rightmost-min tiebreak is what
    // makes both sides select the same gram inside the shared region
    (0 until 10).foreach { trial =>
      val shared = soup(rnd, W + G - 1)
      val a = soup(rnd, rnd.nextInt(30)) + " " + shared + " " + soup(rnd, rnd.nextInt(30))
      val b = soup(rnd, rnd.nextInt(30)) + " " + shared + " " + soup(rnd, rnd.nextInt(30))
      val docs = Seq((1L, a.trim), (2L, b.trim)).toDF("doc_id", "text")
      val pairs = CorpusOps.winnowOverlapOver(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.contains((1L, 2L)),
        s"trial $trial: planted 11-word shared run missed\nA=$a\nB=$b")
    }
  }

  test("d53 pairs carry distinct shared-gram counts (within-doc repeats collapse)") {
    // doc 1 repeats its content; the pair count must count DISTINCT
    // shared grams, not occurrences
    val run = "a b c d e f g h i j k"
    val docs = Seq((1L, s"$run x1 y1 z1 w1 q1 r1 s1 t1 $run"), (2L, run))
      .toDF("doc_id", "text")
    val out = CorpusOps.winnowOverlapOver(docs).collect()
    out.length shouldBe 1
    val want = refWinnow(run).map(_._2).toSet
    val got1 = CorpusOps.winnowOver(docs).filter($"doc_id" === 1L)
      .select("gh").collect().map(_.getLong(0)).toSet
    assert(out.head.getLong(2) <= (want & got1).size.toLong + want.size,
      "shared count exceeds the distinct sketch intersection")
    assert(out.head.getLong(2) >= 1L)
  }

  test("d52 sketch computation plans with zero KEY shuffles (row-local after the scan widening)") {
    // the one permitted exchange is CorpusOps.scanWide's round-robin
    // widening of the pruned scan (no-op on wide inputs — the 100 TB
    // case); the sketch itself must stay row-local: no hash or range
    // partitioning anywhere
    val p = graft.SparkEntry.queries("d52_winnow")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
      s"winnow sketching must not key-shuffle:\n$p")
    assert(p.split("Exchange").length - 1 <= 1, s"at most the widening exchange:\n$p")
  }

  test("d53 overlap keeps the d49 hot-cap guard as a broadcast anti-join") {
    val p = graft.SparkEntry.queries("d53_winnow_overlap")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"stop-gram exclusion should broadcast the tiny hot list:\n$p")
    assert(!p.contains("CartesianProduct"), s"overlap must stay an equi-join:\n$p")
  }
}
