package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the TrainedModelCache contract the at-ingest gates rely on:
  * (1) keys isolate by (model, corpus dir) — no cross-corpus leak;
  * (2) a cache hit returns the SAME model a retrain would (the trainers
  *     are deterministic), so gate output is independent of cache state;
  * (3) a hit does not re-invoke the trainer (the deployment shape: train
  *     once, stream thereafter).
  */
class TrainedModelCacheSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("keys isolate by (model, sfDir); hits never re-invoke the trainer") {
    TrainedModelCache.clear()
    val a = TrainedModelCache.getOrTrain("spec-m", "/corpus/A")(Vector(1L, 2L))
    val b = TrainedModelCache.getOrTrain("spec-m", "/corpus/B")(Vector(9L))
    val a2 = TrainedModelCache.getOrTrain("spec-m", "/corpus/A") {
      fail("trainer must not re-run on a cache hit"): Vector[Long]
    }
    val other = TrainedModelCache.getOrTrain("spec-n", "/corpus/A")(Vector(7L))
    a shouldBe Vector(1L, 2L)
    b shouldBe Vector(9L)
    (a2 eq a) shouldBe true // the cached instance itself
    other shouldBe Vector(7L)
    TrainedModelCache.clear()
  }

  test("gate trainers are deterministic: a retrain is bit-identical to the cached model") {
    val (w1, c1) = CorpusOps.dsirGate(spark, sf001)
    val (w2, c2) = CorpusOps.dsirGate(spark, sf001)
    assert(w1.sameElements(w2)); c1 shouldBe c2
    val (b1, x1, k1) = CorpusOps.minkGate(spark, sf001)
    val (b2, x2, k2) = CorpusOps.minkGate(spark, sf001)
    assert(b1.sameElements(b2) && x1.sameElements(x2)); k1 shouldBe k2
    val (s1, t1, r1) = CorpusOps.rareGate(spark, sf001)
    val (s2, t2, r2) = CorpusOps.rareGate(spark, sf001)
    s1 shouldBe s2; t1 shouldBe t2; r1 shouldBe r2
  }

  test("a gate run against a warm cache equals a cold-trained run") {
    TrainedModelCache.clear()
    val cold = graft.streaming.StreamingQueries
      .s16StreamDsirGate(spark, sf001).collect().toSet // trains + caches
    TrainedModelCache.size should be >= 1
    val warm = graft.streaming.StreamingQueries
      .s16StreamDsirGate(spark, sf001).collect().toSet // pure cache hit
    warm shouldBe cold
    TrainedModelCache.clear()
  }
}
