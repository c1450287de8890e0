package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * graph primitive behind near-dup CLUSTERING (a pair list alone cannot
  * drive dedup: keep/drop decisions need the transitive closure, or two
  * docs that each match a third survive together).
  *
  * Reference analog: the reference has no graph operator; this supports
  * the dedup family the LLM-pipeline layer adds on top of §2.
  */
object GraphOps {

  /** Min-label propagation: every node starts labeled with its own id;
    * each round every node takes the min of its own and its neighbors'
    * labels. Fixpoint = every node holds its component's minimum id.
    * Deterministic (min is order-independent) and exact.
    *
    * Output: (id, label) — one row per node of the edge list, `label` =
    * smallest node id in the component.
    *
    * SCALE: each round is one equi-join of the symmetrized edge list with
    * the label table (both hash-partitioned on the join key — a real
    * cluster co-partitions them once and reuses the layout every round)
    * plus a map-side-partial min aggregation; nothing is ever collected
    * to the driver except the one-row convergence checksum. Round count =
    * graph diameter; near-dup graphs are overwhelmingly tiny star/clique
    * components (diameter 1-2), so propagation converges in ~3 rounds.
    * For adversarial long-chain graphs the known fix is alternating
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) with O(log n) rounds —
    * same join-per-round shape, so this implementation is the building
    * block either way.
    *
    * Convergence check: labels only ever decrease, so the label sum
    * (exact DECIMAL(38,0) — no int64 overflow at any corpus size, no
    * float drift) is strictly decreasing until fixpoint; one single-row
    * aggregate per round detects it without a second join.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val e = edges.toDF("a", "b")
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .union(e.select(col("b").as("src"), col("a").as("dst")))
      .persist()
    // every node of an edge list appears as src after symmetrization, so
    // the per-round join below is inner and total
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()

    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)

    var prev = checksum(labels)
    if (prev != null) { // null = empty graph: nothing to propagate
      var converged = false
      var round = 0
      while (!converged && round < maxIter) {
        val nbrMin = sym.join(labels, sym("dst") === labels("id"))
          .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
        val next = labels.join(nbrMin, labels("id") === nbrMin("src"))
          .select(col("id"), least(col("label"), col("nbr_min")).as("label"))
          .persist()
        val cur = checksum(next)
        converged = cur.compareTo(prev) == 0
        prev = cur
        labels.unpersist()
        labels = next
        round += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds")
    }
    sym.unpersist()
    labels
  }
}
