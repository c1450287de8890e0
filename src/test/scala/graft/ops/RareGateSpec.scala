package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the d72/d73 Count-Min family: exact heavy-hitter audit rows on
  * a planted corpus, the gate's scoring/cutoff/tie semantics, the
  * conservative-admit direction (CMS collisions can only inflate an
  * estimate, so rare counts only ever UNDERCOUNT), the degenerate-
  * history guards, and the zero-shuffle arrival plan.
  */
class RareGateSpec extends AnyFunSuite with SparkSpec with Matchers {

  import spark.implicits._

  test("d72: planted corpus yields exact counts, deterministic top-k cut, overcount 0 when collision-free") {
    // 30 tokens with distinct counts 1..30 — at the production 3x4096
    // geometry no two of their 60-bit hashes share all three 12-bit
    // slices, so every estimate is exact (overcount 0) and the top-20
    // cut is the counts 11..30
    val text = (1 to 30).flatMap(i => Seq.fill(i)(s"tok$i")).mkString(" ")
    val out = CorpusOps.heavyHittersOver(Seq((0L, text)).toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.length shouldBe 20
    out.map(_._2).toSeq shouldBe (30 to 11 by -1).map(_.toLong)
    out.foreach { case (tok, cnt, est, over) =>
      tok shouldBe s"tok$cnt"
      est shouldBe cnt
      over shouldBe 0L
    }
  }

  test("d72: ties at the cut break by token ascending") {
    // four tokens at count 2, room for only two of them in the top-3
    // behind the count-5 leader: the (cnt desc, token asc) total order
    // must pick the lexicographically smallest
    val text = (Seq.fill(5)("zz") ++ Seq.fill(2)("d") ++ Seq.fill(2)("b") ++
      Seq.fill(2)("c") ++ Seq.fill(2)("a")).mkString(" ")
    val all = CorpusOps.heavyHittersOver(Seq((0L, text)).toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // HeavyHittersK = 20 > vocabulary here, so check the ORDER instead
    all.take(5).toSeq shouldBe Seq(("zz", 5L), ("a", 2L), ("b", 2L), ("c", 2L), ("d", 2L))
  }

  test("d73: planted gate — scores exact, cutoff from the rarest 5 percent, ties rejected") {
    // History (even ids): 28 docs of 20 common tokens + 2 docs mixing 10
    // common with 10 fresh singletons. total = 600 history tokens, so a
    // singleton (est 1) is rare (256 < 600) while every common token
    // (est >= 29) is not (7424 >= 600). History scores: 28 docs at
    // 0 ppm, 2 at 500000 — suspects = ceil(30/20) = 2, cutoff 500000.
    val common = (1 to 20).map(i => s"c$i").mkString(" ")
    def mixed(id: Int) =
      ((1 to 10).map(i => s"c$i") ++ (1 to 10).map(i => s"u${id}_$i")).mkString(" ")
    val hist = (0 until 28).map(i => (2L * i, common)) ++
      Seq((56L, mixed(56)), (58L, mixed(58)))
    // Arrivals (odd ids): all-common -> 0 ppm admitted; 5 fresh of 20 ->
    // 250000 admitted; 10 fresh of 20 -> 500000 REJECTED (tie with the
    // cutoff fails closed); all-fresh -> 10^6 rejected
    val arrivals = Seq(
      (1L, common),
      (3L, ((1 to 15).map(i => s"c$i") ++ (1 to 5).map(i => s"a3_$i")).mkString(" ")),
      (5L, mixed(5)),
      (7L, (1 to 20).map(i => s"a7_$i").mkString(" ")))
    val docs = (hist ++ arrivals).toDF("doc_id", "text")

    val histVocab = docs.filter(pmod(col("doc_id"), lit(2L)) === 0L)
      .select(explode(split(lower(trim(col("text"))), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val (cms, total) = CorpusOps.cmsModel(histVocab)
    total shouldBe 600L

    val scored = CorpusOps.rareScored(docs.filter(pmod(col("doc_id"), lit(2L)) === 1L), cms, total)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rare_ppm")).toMap
    scored shouldBe Map(1L -> 0L, 3L -> 250000L, 5L -> 500000L, 7L -> 1000000L)

    val admitted = CorpusOps.rareGateWith(cms, total, 500000L,
        docs.filter(pmod(col("doc_id"), lit(2L)) === 1L))
      .collect().map(_.getLong(0)).toSet
    admitted shouldBe Set(1L, 3L)
  }

  test("d73 conservatism on the corpus: sketch rare counts never exceed the exact ones") {
    // est >= exact count implies sketch-rare is a subset of exact-rare
    // per token, so per doc n_rare(sketch) <= n_rare(exact); at the
    // production geometry over this vocabulary the two are equal
    // (collision-free), which also pins the estimate end to end
    val docs = graft.Tables.documents(spark, sf001)
    val toks = docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), " ")).as("w"))
    val histCnt = toks.filter(pmod(col("doc_id"), lit(2L)) === 0L)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val total = histCnt.agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
    val exact = toks.filter(pmod(col("doc_id"), lit(2L)) === 1L)
      .join(histCnt, Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"),
        count_if(coalesce(col("cnt"), lit(0L)) * lit(CorpusOps.RareDen) < lit(total)).as("nr"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

    val (cms, t2) = CorpusOps.cmsModel(histCnt)
    t2 shouldBe total
    val sketch = CorpusOps.rareScored(
        docs.filter(pmod(col("doc_id"), lit(2L)) === 1L), cms, total)
      .collect().map(r => (r.getLong(0), (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_rare"))))
    sketch.length shouldBe exact.size
    sketch.foreach { case (id, (n, nr)) =>
      val (en, enr) = exact(id)
      n shouldBe en
      assert(nr <= enr, s"doc $id: sketch found $nr rare tokens, exactly $enr exist")
      nr shouldBe enr // collision-free at this vocabulary size
    }
  }

  test("degenerate guards: empty history admits everything; all-common history floors the cutoff at 1") {
    // no even doc_ids at all -> no reference vocabulary -> cutoff
    // Long.MaxValue -> every arrival admitted
    val lonely = Seq((1L, "a b c"), (3L, "d e f")).toDF("doc_id", "text")
    val (cms0, total0) = CorpusOps.cmsModel(
      lonely.filter(pmod(col("doc_id"), lit(2L)) === 0L)
        .select(explode(split(lower(trim(col("text"))), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt")))
    total0 shouldBe 0L
    CorpusOps.rareScored(lonely, cms0, total0)
      .filter(col("rare_ppm") > 0).count() shouldBe 0L // est*256 < 0 never holds

    // small all-common history (total < 256: nothing in-history is
    // rare, every history doc scores 0) -> trained cutoff floors at 1:
    // all-seen arrivals pass, any arrival with one fresh token fails
    val docs = (0 until 10).map(i => (2L * i, "p q r")).toDF("doc_id", "text")
      .union(Seq((1L, "p q r"), (3L, "p q zzz")).toDF("doc_id", "text"))
    val hv = docs.filter(pmod(col("doc_id"), lit(2L)) === 0L)
      .select(explode(split(lower(trim(col("text"))), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val (cms1, total1) = CorpusOps.cmsModel(hv)
    val sc = CorpusOps.rareScored(docs.filter(pmod(col("doc_id"), lit(2L)) === 1L), cms1, total1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rare_ppm")).toMap
    sc(1L) shouldBe 0L
    sc(3L) should be > 0L
    val admitted = CorpusOps.rareGateWith(cms1, total1, 1L,
        docs.filter(pmod(col("doc_id"), lit(2L)) === 1L))
      .collect().map(_.getLong(0)).toSet
    admitted shouldBe Set(1L)
  }

  test("the arrival side plans as a zero-shuffle scan projection") {
    val p = graft.SparkEntry.queries("d73_rare_gate")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"the rare probe must ride the scan (sketch, total and cutoff are literals):\n$p")
  }
}
