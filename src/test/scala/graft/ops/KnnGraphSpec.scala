package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins d58's kNN graph: agreement with d7 (the bounded-query cell
  * search) on the shared query slice, graph-shape invariants, and the
  * blocked-join plan that gives it parallelism beyond the cell count.
  */
class KnnGraphSpec extends AnyFunSuite with SparkSpec with Matchers {

  import org.apache.spark.sql.functions._

  test("d58 top-3 equals d7's first three ranks on the query slice") {
    // d7 searches the same cell for vec_id < 20 at k = 10; the graph's
    // top-3 for those vectors must be exactly d7's rn <= 3 rows
    val graph = VectorOps.d58KnnGraph(spark, sf001)
      .filter(col("q_id") < 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val ivf = VectorOps.d7AnnIvf(spark, sf001)
      .filter(col("rn") <= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(graph.nonEmpty)
    graph shouldBe ivf
  }

  test("graph shape: every vector has at most K neighbors, all in its own cell") {
    val e = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val rows = VectorOps.d58KnnGraph(spark, sf001).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, ns) =>
      ns.length should be <= 3
      ns.map(_.getInt(3)).sorted shouldBe (1 to ns.length).toArray
    }
    rows.foreach { r =>
      e(r.getLong(0)) shouldBe e(r.getLong(1))
      assert(r.getLong(0) != r.getLong(1), "self-edge")
    }
  }

  test("d60 clusters are consistent with the thresholded d58 edges") {
    val edges = VectorOps.d58KnnGraph(spark, sf001)
      .filter(col("sim") >= 0.3).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val clusters = VectorOps.d60SemanticClusters(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(clusters.nonEmpty)
    val label = clusters.map(c => c._1 -> c._2).toMap
    // membership: exactly the vectors on >= 1 strong edge
    label.keySet shouldBe edges.flatMap(e => Seq(e._1, e._2))
    // every edge joins same-cluster members; labels are component minima
    edges.foreach { case (a, b) => label(a) shouldBe label(b) }
    clusters.groupBy(_._2).foreach { case (cid, ms) =>
      ms.map(_._1).min shouldBe cid
      ms.foreach(_._3 shouldBe ms.length.toLong)
    }
  }

  test("d58 plans a blocked shuffle join with group-limited top-k") {
    val p = graft.SparkEntry.queries("d58_knn_graph")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), s"block pairs must meet in a shuffle hash join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the corpus-sized sides must never broadcast or cross:\n$p")
    assert(p.contains("WindowGroupLimit"), s"top-k must prune before the q_id shuffle:\n$p")
  }
}
