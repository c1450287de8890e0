package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.StateStoreBridge

/** Benchmark main. Per-query timing methodology:
  *  - one warm-up pass over every query first (JIT + code cache + parquet
  *    footer caches), then one measured pass;
  *  - each measured run writes to the `noop` sink so the FULL plan executes
  *    (a bare `.count()` lets Catalyst prune every column/expression not
  *    needed for counting — it under-measures projection/window queries);
  *  - failures propagate: a broken query must fail the bench run loudly,
  *    not score ~0 s;
  *  - cross-query residue is scrubbed after every run (`scrub` below): the
  *    ~39 streaming queries each load state-store providers keyed by their
  *    fresh-per-run checkpoint dir into `StateStore.loadedProviders` (never
  *    evicted on query stop — s2 alone pins ~100k dedup keys per run) and
  *    register a `graft_mem_*` memory-sink temp view whose rows
  *    `clearCache()` does not drop. Left in place, 195 query executions
  *    accumulate enough heap that GC pressure inflates allocation-heavy
  *    queries (d26/d27) 4-30x — the r6 bench artifact measured the harness,
  *    not the engine.
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

    // clear any previous run's persisted result up front: a failed run
    // must not leave a stale bench_last.json behind to be read as THIS
    // run's measurement (failures fail loudly, per the scaladoc)
    val lastJson = java.nio.file.Paths.get("target", "bench_last.json")
    java.nio.file.Files.deleteIfExists(lastJson)

    def runOnce(name: String): Unit =
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] query $name FAILED: $e")
          throw e
      }

    // Scrub cross-query residue (see scaladoc): evict every state-store
    // provider the streaming queries loaded and drop their memory-sink temp
    // views so the rows become collectable. Runs OUTSIDE the timed window.
    def scrub(): Unit = {
      spark.catalog.clearCache()
      StateStoreBridge.unloadAll()
      spark.catalog.listTables().collect()
        .filter(t => t.isTemporary && t.name.startsWith("graft_mem_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n => runOnce(n); scrub() } // warm-up
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
      scrub()
      dt
    }
    val results = names.map(name => name -> math.min(timed(name), timed(name)))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // Also persist to a file: the driver tails stdout and noisy stderr can
    // push the metric line out of its window (r6's artifact had parsed:null).
    java.nio.file.Files.createDirectories(lastJson.getParent)
    java.nio.file.Files.write(lastJson, json.getBytes("UTF-8"))
    spark.stop()
  }
}
