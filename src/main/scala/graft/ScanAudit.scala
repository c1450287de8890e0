package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.LogicalRelation

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
          val scans = df.queryExecution.optimizedPlan.collect {
            case r: LogicalRelation =>
              val cols = r.output.map(_.name)
              val table = r.catalogTable.map(_.identifier.table)
                .getOrElse(cols.take(2).mkString("(", ",", ")"))
              s"$table[${cols.mkString(" ")}]"
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
