package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: time named SparkEntry queries at an arbitrary SF dir
  * (Test scope — never ships). One warm-up pass then two measured
  * passes per query, best-of reported, cache/state scrubbed between
  * runs like Bench (without its spin/contention telemetry — this is a
  * far-point iteration tool, not an artifact producer).
  * Usage: SPARK_GRAFT_SF_DIR=... Test/runMain graft.QueryProbe q1 q2 ...
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def scrub(): Unit = {
      spark.catalog.clearCache()
      org.apache.spark.sql.graftbridge.StateStoreBridge.unloadAll()
      spark.catalog.listTables().collect()
        .filter(t => t.isTemporary && t.name.startsWith("graft_mem_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
    }
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      scrub()
      dt
    }
    args.foreach { name =>
      once(name) // warm-up
      val best = math.min(once(name), once(name))
      println(f"QPROBE $name%-28s $best%.2f s")
    }
    spark.stop()
  }
}
