package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins d62's Bloom membership gate: the no-false-negative guarantee
  * (every true duplicate is flagged), the deterministic false-positive
  * behavior, and the zero-shuffle probe plan.
  */
class BloomGateSpec extends AnyFunSuite with SparkSpec with Matchers {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("planted twins across the halves are always flagged; fresh docs pass") {
    // doc 1 (train) and doc 7 (eval) share a word SET -> same d1
    // fingerprint -> all three probe positions set -> must flag.
    // doc 9's vocabulary is disjoint from every train doc.
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta"),
      (4L, "theta iota kappa lambda mu"),
      (7L, "delta gamma beta alpha alpha"), // same word set as doc 0
      (9L, "nu xi omicron pi rho sigma")
    ).toDF("doc_id", "text")
    val out = CorpusOps.bloomGateOver(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.keySet shouldBe Set(7L, 9L)
    out(7L) shouldBe 1L
    // doc 9 could only flag via a 3-way position collision against 9
    // train positions in 2^16 — deterministically it does not
    out(9L) shouldBe 0L
  }

  test("no false negatives on the corpus; false positives are the deterministic remainder") {
    val docs = graft.Tables.documents(spark, sf001)
    val fps = docs.select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(
          split(lower(trim(col("text"))), " "))))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val trainFps = fps.filter(_._1 % 2 == 0).map(_._2).toSet
    val trueDups = fps.filter { case (id, fp) => id % 2 == 1 && trainFps(fp) }
      .map(_._1).toSet
    val flagged = CorpusOps.d62BloomGate(spark, sf001)
      .filter(col("hit") === 1L).collect().map(_.getLong(0)).toSet
    // Bloom guarantee: flagged is a SUPERSET of the true duplicates
    assert(trueDups.subsetOf(flagged),
      s"false negative: ${(trueDups -- flagged).take(5)}")
    assert(trueDups.nonEmpty, "degenerate corpus: no cross-half dups planted")
    // the FP remainder is small at this fill rate (~750 set bits / 2^16)
    val evalN = fps.count(_._1 % 2 == 1)
    assert((flagged -- trueDups).size <= evalN / 20,
      s"implausible FP count: ${(flagged -- trueDups).size} of $evalN")
  }

  test("the probe plans as a zero-shuffle scan projection") {
    val p = graft.SparkEntry.queries("d62_bloom_gate")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"the Bloom probe must ride the scan (the bitmap is a literal):\n$p")
  }
}
