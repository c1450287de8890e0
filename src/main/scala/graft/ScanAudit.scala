package graft

import org.apache.spark.sql.SparkSession


/** Plan-build-only audit: for every registered BATCH query, the number
  * of base-relation scans in the optimized plan and which columns each
  * scan reads (usage: runMain graft.ScanAudit [minScans]). A query
  * re-reading a wide column it could carry through a projection is the
  * most expensive silent plan regression at 100 TB — this prints the
  * whole suite's scan profile in one pass so a new redundancy shows up
  * as a diff, not as a bench surprise. Streaming queries are skipped
  * (plan construction starts their source setup).
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val minScans = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("s")) {
        try {
          val df = fn(spark, sf)
          // physical file scans, not logical relations: the logical
          // node's output is the relation's FULL schema — pruning and
          // pushdown only exist on FileSourceScanExec, and an unpruned
          // text column is exactly what this audit must not hide
          val phys = df.queryExecution.executedPlan match {
            // AQE wraps the plan as a field, not a child — collect()
            // over the wrapper alone would see zero scans
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.executedPlan
            case p => p
          }
          val scans = phys.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec =>
              val cols = s.requiredSchema.fieldNames
              val pushed = s.metadata.getOrElse("PushedFilters", "[]")
              s"[${cols.mkString(" ")}] pushed=$pushed"
          }
          if (scans.size >= minScans)
            println(s"SCANS $name n=${scans.size}\n  " + scans.mkString("\n  "))
        } catch { case e: Throwable =>
          println(s"SCANS $name ERROR ${e.getClass.getSimpleName}")
        }
      }
    }
    spark.stop()
  }
}
