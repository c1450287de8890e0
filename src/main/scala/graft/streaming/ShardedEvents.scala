package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kinesis-shaped streaming source simulation (O1, SURVEY.md §1.4).
  *
  * The reference's source is a merged stream of per-shard ordered record
  * queues (KinesisSource.scala:46-95, 188-204). Spark's file stream source
  * gives the same model offline: the event table is laid out as one
  * directory per shard (shard = hash of the partition key, exactly how
  * Kinesis routes partitionKey -> shard), and `readStream` tails the
  * directory tree with declarative admission control
  * (`maxFilesPerTrigger` — O2/O9's bounded-queue backpressure collapses
  * into pull-based micro-batching).
  *
  * At 100 TB: the shard directories are the stream's partitions; a real
  * Kinesis connector surfaces shards as input partitions the same way.
  * Nothing here is driver-resident — the shard split is a partitioned
  * write, the stream read is a per-partition file tail.
  */
object ShardedEvents {

  val NumShards = 8

  /** Schema of the sharded stream (ts already converted to micros). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("shard", IntegerType)))

  /** Materialize `events` as a shard-partitioned directory tree
    * (`shard=0/ ... shard=7/`), the offline stand-in for a live stream.
    * Records are routed by partition key exactly like Kinesis routes
    * `partitionKey` to a shard.
    */
  def materialize(spark: SparkSession, sfDir: String, outDir: String): Unit =
    Tables.events(spark, sfDir)
      .withColumn("shard", pmod(col("user_id"), lit(NumShards)).cast("int"))
      .repartition(col("shard"))
      // a shard is an ORDERED sequence (KinesisRecord.scala:27-29): sort
      // within each shard partition so file order = sequence order and
      // downstream consumers observe per-key arrival order
      .sortWithinPartitions(col("shard"), col("event_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Open the sharded directory as a stream. `maxFilesPerTrigger` is the
    * record-intake admission control (O9) and the `throttle` analog (C7):
    * it bounds work per micro-batch the way the reference's size-0 queue
    * bounds the KCL thread.
    */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }
}
