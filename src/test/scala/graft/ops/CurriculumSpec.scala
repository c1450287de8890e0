package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins for the d69 curriculum order: positions are a permutation,
  * difficulty phases form contiguous blocks (every head position before
  * every middle before every tail), the phase labels are exactly d47's
  * terciles, and the within-phase order replays the seeded ':curr' md5
  * draw in memory. Given PplFilterPropSpec pins d47's terciles against
  * a full retrain replay, these pins close the operator end to end.
  */
class CurriculumSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def draw(id: Long): Long = md5Prefix60(s"$id:curr")

  test("d69: permutation positions, contiguous phase blocks, d47 phases, draw-ordered within phase") {
    val rows = CorpusOps.d69CurriculumOrder(spark, sf001).collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("phase"),
        r.getAs[Long]("phase_idx"), r.getAs[Long]("pos"))
    }
    assert(rows.nonEmpty)
    rows.map(_._4).sorted shouldBe (1L to rows.length).toArray
    // phases are exactly d47's terciles
    val d47 = CorpusOps.d47PplFilter(spark, sf001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("ppl_bucket")).toMap
    rows.foreach { case (id, phase, idx, _) =>
      phase shouldBe d47(id)
      idx shouldBe Seq("head", "middle", "tail").indexOf(phase).toLong
    }
    // contiguous blocks: the full sequence sorted by pos must equal the
    // in-memory sort by (phase_idx, draw, doc_id) — this pins both the
    // block boundaries and the seeded shuffle inside each block
    val byPos = rows.sortBy(_._4).map(_._1)
    val expected = rows.sortBy(r => (r._3, draw(r._1), r._1)).map(_._1)
    byPos shouldBe expected
  }
}
