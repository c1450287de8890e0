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

  test("a regenerated corpus dir retrains (snapshot fingerprint, not raw path)") {
    TrainedModelCache.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-cache-spec-")
    val f = dir.resolve("part-0.parquet")
    java.nio.file.Files.write(f, "v1".getBytes)
    java.nio.file.Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(1000000L))
    var trains = 0
    def get(): Int = TrainedModelCache.getOrTrain[Integer]("spec-f", dir.toString) {
      trains += 1; Integer.valueOf(trains)
    }
    get() shouldBe 1
    get() shouldBe 1 // unchanged dir: hit
    // the driver regenerates the corpus at the SAME path (the r9
    // incident): same name, new bytes/mtime -> the key changes, retrain
    java.nio.file.Files.write(f, "v2-regenerated".getBytes)
    java.nio.file.Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(2000000L))
    get() shouldBe 2
    get() shouldBe 2
    TrainedModelCache.clear()
  }

  test("path aliases normalize to one key (no double-train on ./ or trailing /)") {
    TrainedModelCache.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-cache-alias-")
    java.nio.file.Files.write(dir.resolve("x.parquet"), "x".getBytes)
    var trains = 0
    def get(path: String): Int = TrainedModelCache.getOrTrain[Integer]("spec-a", path) {
      trains += 1; Integer.valueOf(trains)
    }
    get(dir.toString) shouldBe 1
    get(dir.toString + "/") shouldBe 1
    get(dir.toString + "/./") shouldBe 1
    get(dir.resolve("..").resolve(dir.getFileName).toString) shouldBe 1
    TrainedModelCache.clear()
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
