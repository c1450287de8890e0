package graft.ops

import java.security.MessageDigest

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins d59's hashed embeddings: in-memory replay of the signed
  * feature-hashing + exact L2 normalize, the unit-norm property, and
  * the embedding's actual downstream usefulness (duplicate texts map to
  * identical vectors; the engine's own cosine sees them at 1.0).
  */
class HashedEmbedSpec extends AnyFunSuite with SparkSpec with Matchers {

  import spark.implicits._

  private def refEmbed(text: String): Map[Long, Double] = {
    val md = MessageDigest.getInstance("MD5")
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    text.trim.toLowerCase.split(" ", -1).foreach { w =>
      val d = md.digest(w.getBytes("UTF-8"))
      var v = 0L
      (0 until 8).foreach(b => v = (v << 8) | (d(b) & 0xffL))
      val hv = v >>> 4
      val dim = hv % 16
      counts(dim) += (if (((hv / 16) % 2) == 0) 1L else -1L)
    }
    val n2 = counts.values.map(x => x * x).sum
    if (n2 == 0) Map.empty
    else counts.map { case (dim, v) =>
      dim -> BigDecimal(v / math.sqrt(n2.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  private val vocab = Array("the", "fast", "key", "order", "sort", "table",
    "scan", "merge", "dup", "spark", "join", "window", "stream", "data")

  test("d59 equals the in-memory signed-hashing reference on random docs") {
    val rnd = new scala.util.Random(59)
    val docs = (0L until 50L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val got = CorpusOps.hashedEmbedOver(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = docs.flatMap { case (id, t) =>
      refEmbed(t).map { case (dim, v) => (id, dim) -> v }
    }.toMap
    got shouldBe want
    assert(want.nonEmpty)
  }

  test("every embedded document is unit-norm up to 6-dp rounding") {
    CorpusOps.d59HashedEmbed(spark, sf001)
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sum($"val" * $"val").as("n"))
      .collect().foreach { r =>
        r.getDouble(1) shouldBe 1.0 +- 1e-4
      }
  }

  test("exact-duplicate texts embed identically; the engine's cosine sees 1.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val rows = CorpusOps.hashedEmbedOver(docs).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => r.getLong(1) -> r.getDouble(2)).toMap }
    rows(1L) shouldBe rows(2L)
    val dense = rows.map { case (id, m) =>
      id -> (0L until 16L).map(d => m.getOrElse(d, 0.0))
    }
    def cos(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    cos(dense(1L), dense(2L)) shouldBe 1.0 +- 1e-9
    assert(math.abs(cos(dense(1L), dense(3L))) < 0.99)
  }
}
