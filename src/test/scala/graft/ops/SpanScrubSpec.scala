package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins d61 span scrubbing: the first occurrence keeps its text, later
  * copies lose exactly the duplicated span, within-doc repeats scrub
  * their second occurrence, and the clean_md5 pins the reconstructed
  * bytes against an in-memory replay.
  */
class SpanScrubSpec extends AnyFunSuite with SparkSpec with Matchers {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("later copies lose exactly the duplicated run; the first occurrence is untouched") {
    val run = "q w e r t y u i o p"                    // 10 words: 3 grams
    val a = s"$run alpha beta gamma delta epsilon"      // doc 1: origin
    val b = s"one two three four five six seven eight $run nine ten"
    val c = "fresh words only here nothing shared at all"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = CorpusOps.spanScrubOver(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 (origin): nothing removed, md5 = original text
    out(1L) shouldBe ((15L, 0L, md5hex(a)))
    // doc 3 (no shared grams): untouched
    out(3L) shouldBe ((8L, 0L, md5hex(c)))
    // doc 2: exactly the 10-word copied run is removed
    val (n2, rem2, md2) = out(2L)
    n2 shouldBe 20L
    rem2 shouldBe 10L
    md2 shouldBe md5hex("one two three four five six seven eight nine ten")
  }

  test("a within-doc repeat scrubs its SECOND occurrence only") {
    val run = "a b c d e f g h"                        // exactly one gram
    val doc = s"$run x1 y1 z1 w1 q1 r1 s1 t1 $run"
    val out = CorpusOps.spanScrubOver(Seq((1L, doc)).toDF("doc_id", "text"))
      .collect().head
    out.getLong(1) shouldBe 24L
    out.getLong(2) shouldBe 8L
    out.getString(3) shouldBe md5hex(s"$run x1 y1 z1 w1 q1 r1 s1 t1")
  }

  test("clean_md5 equals an in-memory scrub replay on random dup-planted corpora") {
    val rnd = new scala.util.Random(61)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii",
      "jj", "kk", "ll", "mm", "nn")
    def soup(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val shared = soup(12)
    val docs = (0L until 30L).map { i =>
      val t = if (i % 5 == 0) soup(rnd.nextInt(20)) + " " + shared + " " + soup(rnd.nextInt(20))
              else soup(5 + rnd.nextInt(40))
      (i, t.trim)
    }
    // reference: brute-force global first-occurrence per gram string
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val occ = docs.flatMap { case (id, t) =>
      val ws = toks(id)
      (0 to ws.length - 8).map(p => (ws.slice(p, p + 8).mkString(" "), id, p))
    }
    val firsts = occ.groupBy(_._1).map { case (g, os) =>
      g -> os.map(o => (o._2, o._3)).min
    }
    val want = docs.map { case (id, _) =>
      val ws = toks(id)
      val red = (0 to ws.length - 8).filter { p =>
        firsts(ws.slice(p, p + 8).mkString(" ")) != ((id, p))
      }
      val covered = red.flatMap(p => p until p + 8).toSet
      val kept = ws.zipWithIndex.collect { case (w, i) if !covered(i) => w }
      (id, ws.length.toLong, (ws.length - kept.length).toLong,
        md5hex(kept.mkString(" ")))
    }.toSet
    val got = CorpusOps.spanScrubOver(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    got shouldBe want
    assert(want.exists(_._3 > 0), "degenerate corpus: nothing scrubbed")
  }
}
