package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.types.StructType

/** Bridge into `private[sql]` [[DataSource]] construction, so the
  * registered `graft-shards` stream provider can DELEGATE file tracking
  * to Spark's own `FileStreamSource` instead of re-implementing it: the
  * returned source owns the per-batch file-metadata log (exactly-once
  * file admission across restarts), `maxFilesPerTrigger` admission
  * control, and `Trigger.AvailableNow` end-offset pinning — the proven
  * machinery every built-in file stream runs on. Same isolation rationale
  * as [[ColumnBridge]]: one shim, the rest of graft stays on public API.
  */
object FileSourceBridge {

  /** A parquet `FileStreamSource` rooted at `path`, writing its file
    * metadata log under `metadataPath` (the per-source subdirectory of
    * the query checkpoint that `createSource` receives).
    */
  def parquetStreamSource(spark: SparkSession, metadataPath: String,
      schema: StructType, path: String, options: Map[String, String]): Source =
    DataSource(
      sparkSession = spark,
      className = "parquet",
      userSpecifiedSchema = Some(schema),
      options = options + ("path" -> path)
    ).createSource(metadataPath)
}
