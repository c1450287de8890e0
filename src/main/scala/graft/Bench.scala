package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Per-query timing methodology:
  *  - one warm-up pass over every query first (JIT + code cache + parquet
  *    footer caches), then one measured pass;
  *  - each measured run writes to the `noop` sink so the FULL plan executes
  *    (a bare `.count()` lets Catalyst prune every column/expression not
  *    needed for counting — it under-measures projection/window queries);
  *  - failures propagate: a broken query must fail the bench run loudly,
  *    not score ~0 s.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS); see graft.Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Unit =
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] query $name FAILED: $e")
          throw e
      }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n => runOnce(n); spark.catalog.clearCache() } // warm-up
    // min of 2 measured passes: suppresses one-off GC/IO noise without
    // hiding real cost (each pass still executes the full plan).
    // Cache is cleared OUTSIDE the timed window: queries persist only
    // within their own execution (iterative ops like d25's connected
    // components), so leftover blocks are pure cross-query memory
    // pressure that skews later timings, never a warm-start benefit.
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      runOnce(name)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    val results = names.map(name => name -> math.min(timed(name), timed(name)))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
