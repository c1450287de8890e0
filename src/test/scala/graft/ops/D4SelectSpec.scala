package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the d55 D4 composition (`VectorOps.d4SelectOver`): SemDeDup
  * keep set, then per-cell prototype pruning of the most-central
  * quarter. The in-memory replay recomputes both stages (the
  * SemDedupPropSpec reference extended with the rank-and-drop rule);
  * structural tests pin the composition soundness and the drop count.
  */
class D4SelectSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Tau = 0.38

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private def centroid(vs: Seq[Seq[Double]]): Seq[Double] = {
    val dim = vs.head.length
    (0 until dim).map { i =>
      val sq = vs.map(v => math.floor(v(i) * 1048576.0).toLong).sum
      sq.toDouble / (vs.size.toLong * 1048576.0)
    }
  }

  /** Both stages in memory: SemDeDup keeps, then rank on rounded csim
    * desc (vec_id tiebreak) and select rank > n div 4 per cell.
    */
  private def d4Ref(rows: Seq[(Long, Seq[Double], Int)]): Set[(Long, Long, Double, Long)] =
    rows.groupBy(_._3).iterator.flatMap { case (label, members) =>
      val c = centroid(members.map(_._2))
      val cs = members.map { case (id, v, _) => (id, v, cos(v, c)) }
      val kept = cs.filterNot { case (id, v, csim) =>
        cs.exists { case (oid, ov, ocsim) =>
          oid != id && cos(v, ov) >= Tau &&
            (ocsim < csim || (ocsim == csim && oid < id))
        }
      }.map { case (id, _, csim) =>
        (id, BigDecimal(csim).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val ranked = kept.sortBy { case (id, r6) => (-r6, id) }.zipWithIndex
        .map { case ((id, r6), i) => (id, label.toLong, r6, i + 1L) }
      ranked.filter(_._4 > kept.size / 4)
    }.toSet

  private val vecGen: Gen[Seq[Double]] =
    Gen.listOfN(4, Gen.choose(-8, 8).map(_ / 8.0)).map(_.toSeq)
      .suchThat(v => v.exists(_ != 0.0))

  private val corpusGen: Gen[Seq[(Long, Seq[Double], Int)]] = for {
    m <- Gen.choose(2, 40)
    ids <- Gen.listOfN(m, Gen.choose(0L, 10000L)).map(_.distinct)
    rows <- Gen.sequence[Seq[(Long, Seq[Double], Int)], (Long, Seq[Double], Int)](
      ids.map { id =>
        for { v <- vecGen; cell <- Gen.choose(0, 2) } yield (id, v, cell)
      })
  } yield rows

  test("d55 core: SemDeDup + prototype pruning == in-memory replay on random corpora") {
    import spark.implicits._
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25),
      Prop.forAll(corpusGen) { rows =>
        val got = VectorOps.d4SelectOver(
          rows.toDF("vec_id", "v", "label").repartition(5))
          .as[(Long, Long, Double, Long)].collect().toSet
        got == d4Ref(rows)
      })
    assert(res.passed, res.status.toString)
  }

  test("d55 composes d46 verbatim: selected = kept minus each cell's top quarter") {
    val sel = VectorOps.d55D4Select(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val kept = VectorOps.d46SemDedup(spark, sf001)
      .filter(org.apache.spark.sql.functions.col("kept") === 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sel.nonEmpty)
    // soundness: every selected vector survived SemDeDup
    sel.foreach { case (id, cell, _) => assert(kept.contains((id, cell))) }
    // drop count: per cell, exactly n_kept div 4 are pruned
    kept.groupBy(_._2).foreach { case (cell, members) =>
      val nSel = sel.count(_._2 == cell)
      nSel shouldBe members.size - members.size / 4
    }
    // rank sanity: prot_rk starts strictly after the dropped quarter
    sel.groupBy(_._2).foreach { case (cell, members) =>
      val nKept = kept.count(_._2 == cell)
      members.map(_._3).min shouldBe nKept / 4 + 1
    }
  }

  test("d55 rank decomposes over buckets: no per-cell global sort in the plan") {
    val p = graft.SparkEntry.queries("d55_d4_select")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange rangepartitioning"),
      s"global sort leaked into the prototype rank:\n$p")
  }
}
