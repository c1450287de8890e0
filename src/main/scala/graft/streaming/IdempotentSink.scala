package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Idempotent `foreachBatch` sink: the `markProcessed` replacement
  * (O5/C9, SURVEY.md §7.4).
  *
  * The reference gives at-least-once delivery and leaves dedup to the
  * consumer (KinesisRecord.scala:21-37: ack via completionPromise). Spark
  * replays the last uncommitted batch on restart, so a sink keyed by
  * `batchId` — each batch written to its own partition directory with
  * overwrite — makes the end-to-end pipeline exactly-once: a replayed
  * batch overwrites its own previous (possibly partial) output instead of
  * appending a duplicate.
  *
  * At 100 TB this is the standard pattern: per-epoch atomic-rename commits
  * into a partitioned table, or a transactional sink keyed by epoch.
  */
object IdempotentSink {

  /** Write one micro-batch to `outDir/batch_id=<id>`, idempotently. */
  def writeBatch(df: DataFrame, batchId: Long, outDir: String): Unit =
    df.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Read back everything the sink has committed. */
  def readAll(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", outDir).parquet(s"$outDir/batch_id=*")
}
