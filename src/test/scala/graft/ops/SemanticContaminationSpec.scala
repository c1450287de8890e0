package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins d56 semantic contamination: planted eval/train near-dups are
  * detected (including scaled copies n-gram checks can't see), clean
  * corpora stay clean, and the plan keeps the exact broadcast sweep
  * (no corpus shuffle, no recall-losing pruning).
  */
class SemanticContaminationSpec extends AnyFunSuite with SparkSpec with Matchers {

  import spark.implicits._

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum
  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("planted contamination is detected; scaled copies score cosine 1") {
    val rnd = new scala.util.Random(56)
    def randv(): Seq[Double] = Seq.fill(8)(rnd.nextGaussian())
    // eval ids are multiples of 25; train id 3 is a SCALED copy of eval
    // 50 (cosine exactly 1 — the paraphrase-with-same-meaning stand-in),
    // train id 7 is an orthogonal-ish fresh vector
    val ev50 = randv()
    val rows = Seq(
      (25L, randv()), (50L, ev50), (75L, randv()),
      (3L, ev50.map(_ * 0.5)), (7L, randv()), (11L, randv()))
    val out = VectorOps.semanticContaminationOver(rows.toDF("vec_id", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists { case (e, t, s) => e == 50L && t == 3L && s == 1.0 },
      s"scaled copy missed: ${out.mkString(", ")}")
    // completeness AND soundness vs the in-memory brute sweep
    val want = for {
      (eid, evv) <- rows.filter(_._1 % 25 == 0)
      (tid, tv) <- rows.filter(_._1 % 25 != 0)
      s = cos(evv, tv) if s >= 0.38
    } yield (eid, tid)
    out.map(r => (r._1, r._2)).toSet shouldBe want.toSet
  }

  test("a corpus with no near pairs reports zero contamination") {
    // axis-aligned unit vectors: all cross cosines are 0
    val rows = (0L until 8L).map { i =>
      (if (i < 2) i * 25 else i, Seq.tabulate(8)(j => if (j == i % 8) 1.0 else 0.0))
    }
    VectorOps.semanticContaminationOver(rows.toDF("vec_id", "v")).count() shouldBe 0L
  }

  test("d56 broadcasts the eval side and never shuffles the corpus") {
    val p = graft.SparkEntry.queries("d56_semantic_contamination")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), s"eval side must broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"the corpus must not shuffle:\n$p")
  }
}
