package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => asize}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins d66's window-Bloom novelty gate: exact scores on a planted
  * corpus, the conservative-admit guarantee (Bloom false positives can
  * only undercount novelty, so every admitted doc is truly
  * majority-new), and the zero-shuffle probe plan.
  */
class NoveltyGateSpec extends AnyFunSuite with SparkSpec with Matchers {

  import spark.implicits._

  test("planted corpus: verbatim reprints rejected at 0 ppm, fresh docs admitted at 10^6, near-copies rejected") {
    // history = doc 0 (12 words, 5 windows). Arrivals: doc 1 verbatim
    // copy (all windows seen -> 0 ppm), doc 3 disjoint vocabulary
    // (10^6 ppm — a false positive needs a 3-way 20-bit collision
    // against <=15 set bits of 2^20, deterministically absent here),
    // doc 5 = history with the LAST word changed (1 of 5 windows new ->
    // exactly 200000 ppm, under the majority threshold)
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val b = (1 to 12).map(i => s"x$i").mkString(" ")
    val docs = Seq((0L, a), (1L, a), (3L, b), (5L, a.replace("w12", "y12")))
      .toDF("doc_id", "text")
    val out = CorpusOps.noveltyGateOver(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("novelty_ppm")).toMap
    out.keySet shouldBe Set(3L)
    out(3L) shouldBe 1000000L
  }

  test("conservative admission on the corpus: admitted is a subset of exactly-majority-new; FP undercount bounded") {
    val w = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), array_distinct(graft.functions.WordWindowMd5
        .wordWindowMd5(lower(trim(col("text"))), 8)).as("ws"))
      .filter(asize(col("ws")) > 0)
    val hist = w.filter(pmod(col("doc_id"), lit(2L)) === 0L)
      .select(explode(col("ws")).as("gh")).distinct()
      .withColumn("seen", lit(1))
    val exact = w.filter(pmod(col("doc_id"), lit(2L)) === 1L)
      .select(col("doc_id"), explode(col("ws")).as("gh"))
      .join(hist, Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"), count_if(col("seen").isNull).as("nn"))
      .withColumn("ppm", expr("(1000000 * nn) div nw"))
      .collect().map(r => (r.getLong(0), (r.getAs[Long]("nw"), r.getAs[Long]("nn")))).toMap
    val gate: Map[Long, (Long, Long)] = CorpusOps.d66NoveltyGate(spark, sf001).collect()
      .map(r => (r.getLong(0), (r.getAs[Long]("n_windows"), r.getAs[Long]("n_new")))).toMap

    assert(gate.nonEmpty, "degenerate corpus: nothing admitted")
    // Bloom cannot false-negative a seen window, so per doc the gate's
    // new-count is a LOWER bound on the exact one — admission implies
    // true majority-novelty
    gate.foreach { case (id, (nw, nn)) =>
      val (enw, enn) = exact(id)
      nw shouldBe enw
      assert(nn <= enn, s"doc $id: gate found $nn new windows, exactly $enn exist")
      assert(1000000L * enn / enw >= 500000L,
        s"doc $id admitted but only $enn/$enw windows are truly new")
    }
    // and the undercount is the small deterministic FP remainder, not a
    // gutted score: at this fill rate the admitted set misses few of the
    // exactly-majority-new docs
    val exactAdmit = exact.filter { case (_, (nw, nn)) => 1000000L * nn / nw >= 500000L }.keySet
    assert(gate.keySet.subsetOf(exactAdmit))
    assert((exactAdmit -- gate.keySet).size <= math.max(1, exactAdmit.size / 20),
      s"FP undercount rejected ${(exactAdmit -- gate.keySet).size} of ${exactAdmit.size} truly-novel docs")
  }

  test("the probe plans as a scan projection — no key shuffle, at most the widening exchange") {
    // the r13 scanWide relaxation (CorpusOps.scanWide): a narrow batch
    // scan may gain ONE round-robin widening Exchange; the pin's point —
    // the bitmap is a literal, so no hash/range partitioning and no join
    // anywhere in the probe — stands
    val p = graft.SparkEntry.queries("d66_novelty_gate")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
      s"the window probe must ride the scan (the bitmap is a literal):\n$p")
    assert(!p.contains("Join"), s"no join belongs in the probe:\n$p")
  }
}
