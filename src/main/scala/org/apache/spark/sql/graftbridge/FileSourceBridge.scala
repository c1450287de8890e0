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

  /** The files a `FileStreamSource` rooted at `metadataPath` has ALREADY
    * admitted (its per-batch file-metadata log), as qualified Hadoop
    * paths. Read-only second view over the same on-disk log the live
    * source appends to — lets a wrapping source compute the PENDING file
    * set (listing minus admitted) for record-based admission control
    * without duplicating the source's seen-files state.
    */
  def admittedFiles(spark: SparkSession, metadataPath: String): Set[org.apache.hadoop.fs.Path] = {
    import org.apache.spark.sql.execution.streaming.runtime.FileStreamSourceLog
    val log = new FileStreamSourceLog(FileStreamSourceLog.VERSION, spark, metadataPath)
    log.allFiles().map(_.sparkPath.toPath).toSet
  }
}
