package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property pin for the d46 SemDeDup core (`VectorOps.semDedupOver`)
  * against an in-memory reference that recomputes the exact-integer
  * cell centroids, centroid similarities, and the pairwise keep-rule
  * directly (same IEEE double arithmetic, same index-order folds). The
  * DuckDB oracle covers one corpus; this covers random ones: singleton
  * cells, cells where EVERY pair is a near-dup (the keep-rule must
  * still keep at least the minimal member), exact csim ties broken by
  * vec_id, and thresholds straddled from both sides.
  */
class SemDedupPropSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Tau = 0.38

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** Exact-integer centroid (floor-quantized 2^20ths summed as longs),
    * the engines' shared definition.
    */
  private def centroid(vs: Seq[Seq[Double]]): Seq[Double] = {
    val dim = vs.head.length
    (0 until dim).map { i =>
      val sq = vs.map(v => math.floor(v(i) * 1048576.0).toLong).sum
      sq.toDouble / (vs.size.toLong * 1048576.0)
    }
  }

  private def semDedupRef(rows: Seq[(Long, Seq[Double], Int)]): Set[(Long, Long, Double, Long)] =
    rows.groupBy(_._3).iterator.flatMap { case (label, members) =>
      val c = centroid(members.map(_._2))
      val cs = members.map { case (id, v, _) => (id, v, cos(v, c)) }
      cs.map { case (id, v, csim) =>
        val droppedBy = cs.exists { case (oid, ov, ocsim) =>
          oid != id && cos(v, ov) >= Tau &&
            (ocsim < csim || (ocsim == csim && oid < id))
        }
        (id, label.toLong,
          BigDecimal(csim).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          if (droppedBy) 0L else 1L)
      }
    }.toSet

  // values on a coarse grid in [-1, 1] so near-dup and exact-tie cases
  // actually occur; zero vectors excluded (cosine undefined — the
  // operator's domain is unit-normalizable embeddings)
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

  test("d46 core: per-cell SemDeDup keep-rule == in-memory replay on random corpora") {
    import spark.implicits._
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25),
      Prop.forAll(corpusGen) { rows =>
        val got = VectorOps.semDedupOver(
          rows.toDF("vec_id", "v", "label").repartition(5))
          .as[(Long, Long, Double, Long)].collect().toSet
        got == semDedupRef(rows)
      })
    assert(res.passed, res.status.toString)
  }

  test("d46 keep-rule structure: every cell keeps its minimal-csim member") {
    // the (csim, vec_id)-minimal member of a cell can never be dropped:
    // no neighbor precedes it in the keep order
    val rows = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0), 0), (2L, Seq(0.9, 0.1, 0.0, 0.0), 0),
      (3L, Seq(0.8, 0.2, 0.0, 0.0), 0), (4L, Seq(-1.0, 0.5, 0.0, 0.0), 1),
      (5L, Seq(-1.0, 0.5, 0.0, 0.0), 1))
    val ref = semDedupRef(rows)
    rows.groupBy(_._3).foreach { case (_, members) =>
      val byId = ref.filter(r => members.exists(_._1 == r._1))
      val minMember = byId.minBy(r => (r._3, r._1))
      withClue(s"cell ${members.head._3}: ") { minMember._4 shouldBe 1L }
    }
    // and the planted exact twins (4, 5) tie on csim — vec_id breaks it:
    // 4 is kept, 5 is dropped
    ref.find(_._1 == 4L).get._4 shouldBe 1L
    ref.find(_._1 == 5L).get._4 shouldBe 0L
  }
}
