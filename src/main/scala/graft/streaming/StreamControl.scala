package graft.streaming

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.streaming.StreamingQuery
import scala.jdk.CollectionConverters._

/** Stream lifecycle control: the kill-switch / termination surface
  * (O11/O13/C11) and checkpoint observability (Q4).
  *
  * The reference wires `KillSwitches.single` + `watchTermination` so a
  * downstream cancel or an `abort(e)` tears down both the stream and the
  * KCL worker (KinesisSource.scala:70-74, 159-161). In Spark the query IS
  * the worker: `stop()` is the graceful shutdown (batch-boundary, KCL
  * `shutdownRequested` analog), task/worker failure surfaces through
  * `query.exception` and `awaitTermination` rethrow — the same
  * bidirectional propagation.
  */
object StreamControl {

  /** Graceful stop: drain everything currently available (the reference's
    * bounded shutdown drain, ShardCheckpointConfig
    * `maxWaitForCompletionOnStreamShutdown`), then stop at a batch
    * boundary. Safe to call on an already-stopped query.
    */
  def stopGracefully(query: StreamingQuery): Unit = {
    if (query.isActive) {
      query.processAllAvailable()
      query.stop()
    }
    query.awaitTermination()
  }

  /** Number of committed epochs in a checkpoint location — the analog of
    * the reference's acked-checkpoint counters that gate its test phases
    * (Q4, Inspectable.scala:70-106). Each file in `commits/` is one
    * durably committed micro-batch.
    */
  def checkpointCommits(checkpointLocation: String): Long =
    countMetadataFiles(Paths.get(checkpointLocation, "commits"))

  /** Number of written offset intents (the WAL): offsets are written
    * BEFORE a batch runs, commits after its sink write — the gap between
    * the two is exactly the replayed-on-restart batch (at-least-once).
    */
  def checkpointOffsets(checkpointLocation: String): Long =
    countMetadataFiles(Paths.get(checkpointLocation, "offsets"))

  private def countMetadataFiles(dir: Path): Long =
    if (!Files.isDirectory(dir)) 0L
    else {
      val s = Files.list(dir)
      try s.iterator.asScala.count(p => p.getFileName.toString.forall(_.isDigit))
      finally s.close()
    }
}
