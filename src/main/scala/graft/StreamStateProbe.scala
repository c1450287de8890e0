package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** State-volume probe for the stateful streaming gates: runs named
  * queries once and prints every micro-batch's per-operator state rows
  * (`numRowsTotal` / `numRowsUpdated`) from StreamingQueryProgress —
  * the instrument for far-point state-bound questions (r15 verdict
  * item 5: does s12/s13's cross-band candidate-dedup term bend at 16×?).
  * Usage: `runMain graft.StreamStateProbe <name>[,<name>...]`.
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        p.stateOperators.zipWithIndex.foreach { case (op, i) =>
          println(f"STATE batch=${p.batchId}%3d op$i=${op.operatorName}%-28s " +
            f"rowsTotal=${op.numRowsTotal}%10d updated=${op.numRowsUpdated}%10d " +
            f"memUsed=${op.memoryUsedBytes}%12d")
        }
      }
    })
    for (name <- names) {
      println(s"QUERY $name")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"DONE $name wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      org.apache.spark.sql.graftbridge.StateStoreBridge.unloadAll()
    }
    spark.stop()
  }
}
