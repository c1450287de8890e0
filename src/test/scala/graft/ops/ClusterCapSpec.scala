package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins for the d68 diversity cap over d60's semantic clusters: the
  * member set is exactly d60's, ranks are a per-cluster permutation of
  * the seeded ':cap' md5 draw order, the kept flag follows the rank cap,
  * and every cluster keeps min(2, size) representatives. The DuckDB
  * oracle replays the same integer arithmetic; these pins hold the
  * contract under reruns (determinism) and any fixture.
  */
class ClusterCapSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def capRows() =
    VectorOps.d68ClusterCap(spark, sf001).collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Long]("keep_rk"), r.getAs[Long]("kept"))
    }

  test("d68: members are exactly d60's clusters; ranks are per-cluster permutations") {
    val rows = capRows()
    assert(rows.nonEmpty, "fixture should contain at least one semantic cluster")
    val d60 = VectorOps.d60SemanticClusters(spark, sf001).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))
      .toSet
    rows.map(r => (r._1, r._2, r._3)).toSet shouldBe d60
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val size = members.head._3
      members.map(_._4).sorted shouldBe (1L to size).toArray
      withClue(s"cluster $cid:") {
        members.count(_._5 == 1L) shouldBe math.min(2L, size)
      }
    }
  }

  test("d68: kept follows the rank cap and the draw order (smaller ':cap' hash kept first)") {
    val rows = capRows()
    rows.foreach { r =>
      r._5 shouldBe (if (r._4 <= 2L) 1L else 0L)
    }
    // replay the seeded draw in memory: within a cluster, keep_rk must
    // sort by (md5(vec_id || ':cap') 60-bit prefix, vec_id)
    def draw(id: Long): Long = md5Prefix60(s"$id:cap")
    rows.groupBy(_._2).foreach { case (_, members) =>
      val expected = members.sortBy(m => (draw(m._1), m._1)).map(_._1)
      val got = members.sortBy(_._4).map(_._1)
      got shouldBe expected
    }
  }

  test("d68 determinism: a rerun returns the identical keep set") {
    capRows().toSet shouldBe capRows().toSet
  }
}
