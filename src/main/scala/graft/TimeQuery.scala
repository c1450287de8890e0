package graft
import org.apache.spark.sql.SparkSession

/** Scratch timing harness: time named queries N times each outside the
  * full bench (usage: runMain graft.TimeQuery <name>[,<name>...] <n>
  * [scrub] [confK=V ...]). `scrub` clears the SQL cache between runs (the
  * bench's discipline), so warm runs measure recompute, not a
  * replace-on-call cache hit. Each query-name boundary samples the
  * ALL-CORE spin floor and every run prints its /proc/stat steal delta,
  * so a scaling table built from these numbers carries the same
  * contention evidence the full bench artifact does (r14 verdict item 5:
  * far-point tables must quote floors + steal, not bare walls).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq; val n = args(1).toInt
    val scrub = args.contains("scrub")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    for (name <- names) {
      println(f"FLOOR $name allCoreSpinMs ${Bench.allCoreSpinProbe()}%.1f")
      for (i <- 1 to n) {
        if (scrub) {
          spark.catalog.clearCache()
          org.apache.spark.sql.graftbridge.StateStoreBridge.unloadAll()
          // the bench's full discipline: drop the streaming memory-sink
          // views too — at far-point scales their retained result rows are
          // real heap pressure that degrades every LATER run in the JVM
          spark.catalog.listTables().collect()
            .filter(t => t.isTemporary && t.name.startsWith("graft_mem_"))
            .foreach(t => spark.catalog.dropTempView(t.name))
        }
        def gcMs: Long = {
          import scala.jdk.CollectionConverters._
          java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
            .asScala.map(_.getCollectionTime).sum
        }
        val g0 = gcMs
        val c0 = osBean.getProcessCpuTime
        val st0 = Bench.stealSec()
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"timequery: $name run $i")
        SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(null)
        val st1 = Bench.stealSec()
        val steal = if (st0 >= 0 && st1 >= 0) st1 - st0 else -1.0
        println(f"TIME $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
          f" cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%.2f s" +
          f" gc ${(gcMs - g0) / 1e3}%.2f s" +
          f" steal $steal%.2f s")
      }
    }
    spark.stop()
  }
}
