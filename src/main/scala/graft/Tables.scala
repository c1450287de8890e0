package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned scans over an object store; all
  * downstream operators in this library are written against the declarative
  * DataFrame API so Catalyst performs column pruning + predicate pushdown into
  * the parquet scan regardless of physical layout (verify with
  * `.explain("formatted")`: `PushedFilters` / `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped as two physical types across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark 4 rejects unless
    * `spark.sql.legacy.parquet.nanosAsLong=true`, surfacing the column as a
    * nanos LongType — and plain TIMESTAMP(MICROS), which reads natively as
    * TimestampType. This loader is the single normalization point: it
    * inspects the scanned schema and converts only when needed, so every
    * downstream operator sees a microsecond TimestampType either way. The
    * nanos path uses integer division (no double round-trip — epoch-nanos
    * exceed 2^53). Loaders never mutate shared session config.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        // naive micros (isAdjustedToUTC=false): every session in this
        // library runs at UTC, so the NTZ->TZ cast is instant-preserving
        // and matches how the DuckDB oracle reads the same file
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unexpected physical type $other (want nanos-long or timestamp)")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
}
