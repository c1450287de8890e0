package graft.streaming

import java.io.IOException
import java.net.URI
import java.util.concurrent.atomic.AtomicLong
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A degraded checkpoint STORE: the Spark analog of the reference's
  * 1-RPS-throttled DynamoDB lease table
  * (`KinesisSourceTest.scala:230-258` "completes successfully with
  * dynamoDb throttling", error taxonomy `RecordProcessorImpl.scala:229-241`)
  * — every metadata-log operation on a `flaky://` checkpoint path incurs
  * injected latency, and one commit-log write can be armed to fail
  * outright. Registered per-scheme via `fs.flaky.impl`, so ONLY the
  * checkpoint path degrades; source and sink stay healthy. State lives on
  * the companion because Hadoop constructs and caches FileSystem
  * instances reflectively.
  */
object FlakyCheckpointFs {
  /** operations that experienced injected latency */
  val delayedOps = new AtomicLong(0)
  @volatile var latencyMs: Long = 0
  /** when armed, the next write that lands in the commit log throws —
    * one shot, like the reference's transient throttling burst */
  @volatile var failNextCommit: Boolean = false

  private[streaming] def inject(path: Path): Unit = {
    if (latencyMs > 0) {
      delayedOps.incrementAndGet()
      Thread.sleep(latencyMs)
    }
    if (failNextCommit && path.toString.contains("/commits/")) {
      failNextCommit = false
      throw new IOException(s"injected checkpoint-store degradation on $path")
    }
  }
}

class FlakyCheckpointFs extends RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: URI = URI.create("flaky:///")

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    FlakyCheckpointFs.inject(f)
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }

  // the atomic metadata-log protocol writes a temp file then renames it
  // into place — inject on the DESTINATION, where the commit becomes
  // visible
  override def rename(src: Path, dst: Path): Boolean = {
    FlakyCheckpointFs.inject(dst)
    super.rename(src, dst)
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    FlakyCheckpointFs.inject(f)
    super.mkdirs(f, permission)
  }
}
