package graft
import org.apache.spark.sql.SparkSession
object StarProbe {
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
      val t0 = System.nanoTime()
      val out = graft.ops.GraphOps.d63ChainComponents(spark, sf)
      val n = out.count()
      println(f"SPROBE d63: ${(System.nanoTime()-t0)/1e9}%.2f s ($n nodes, route=${graft.ops.GraphOps.lastRoute.get()}, starRounds=${graft.ops.GraphOps.lastStarRounds.get()})")
    }
    spark.stop()
  }
}
