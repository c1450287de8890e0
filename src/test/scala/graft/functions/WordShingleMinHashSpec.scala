package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class WordShingleMinHashSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val p = 2147483647L
  private val sa = Seq(1234567L, 87654321L, 1999999999L)
  private val sb = Seq(7L, 42L, 1000000L)

  /** Independent reference implementation: materialize the shingle
    * STRINGS (words joined by one space), FNV-1a each, fold, take affine
    * minima — the span-based kernel must agree exactly.
    */
  private def reference(text: String, n: Int): Seq[Long] = {
    val words = text.split(" ", -1)
    val shingles = words.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    val mins = Array.fill(sa.length)(Long.MaxValue)
    shingles.foreach { s =>
      var h = 0xcbf29ce484222325L
      s.foreach(c => h = (h ^ c) * 0x100000001b3L)
      val base = java.lang.Long.remainderUnsigned(h, p)
      sa.indices.foreach { m =>
        val v = (base * sa(m) + sb(m)) % p
        if (v < mins(m)) mins(m) = v
      }
    }
    mins.toSeq
  }

  test("span-hashed kernel equals the materialized-shingle-string reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val vocab = Seq("alpha", "beta", "g", "", "δδ", "ee-ee", "zzz")
    val rows = Seq.fill(300)(
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val df = rows.map(Tuple1(_)).toDF("t")
    val got = df.select(col("t"),
        WordShingleMinHash.wordShingleMinhash(col("t"), 3, sa, sb, p).as("mh"))
      .collect()
    got.foreach { r =>
      withClue(s"text '${r.getString(0)}':") {
        r.getSeq[Long](1) shouldBe reference(r.getString(0), 3)
      }
    }
  }

  test("kernel agrees with the reference on real corpus text") {
    val got = graft.Tables.documents(spark, sf001)
      .select(lower(trim(col("text"))).as("t"))
      .select(col("t"), WordShingleMinHash.wordShingleMinhash(col("t"), 3, sa, sb, p).as("mh"))
      .collect()
    got.foreach { r =>
      r.getSeq[Long](1) shouldBe reference(r.getString(0), 3)
    }
  }

  test("fewer than n words yields the empty-set signature; null yields null") {
    import spark.implicits._
    val df = Seq(Tuple1("one two")).toDF("t")
    df.select(WordShingleMinHash.wordShingleMinhash(col("t"), 3, sa, sb, p))
      .head().getSeq[Long](0) shouldBe Seq.fill(3)(Long.MaxValue)
    val nul = df.select(
      WordShingleMinHash.wordShingleMinhash(lit(null).cast("string"), 3, sa, sb, p)).head()
    assert(nul.isNullAt(0))
  }
}
