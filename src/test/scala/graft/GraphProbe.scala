package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: time the stages of a graph query and report the
  * propagation round count (Test scope — never ships).
  * Usage: Test/runMain graft.GraphProbe <query>
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      var t0 = System.nanoTime()
      val edges = graft.ops.VectorOps.d58KnnGraph(spark, sf)
        .filter(col("sim") >= 0.3)
        .select(least(col("q_id"), col("n_id")).as("a"),
          greatest(col("q_id"), col("n_id")).as("b"))
        .distinct().persist()
      val ne = edges.count()
      println(f"PROBE edges: ${(System.nanoTime() - t0) / 1e9}%.2f s ($ne rows)")
      t0 = System.nanoTime()
      val lab = graft.ops.GraphOps.connectedComponents(edges)
      val n = lab.count()
      println(f"PROBE cc: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n nodes, " +
        s"route=${graft.ops.GraphOps.lastRoute.get()}, rounds=${graft.ops.GraphOps.lastRounds.get()})")
      edges.unpersist()
    }
    spark.stop()
  }
}
