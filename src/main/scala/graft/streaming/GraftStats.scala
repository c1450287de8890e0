package graft.streaming

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** ConsumerStats re-expressed as a `StreamingQueryListener` (O15).
  *
  * The reference exposes ten callback hooks for checkpoint acks, in-flight
  * record gauges and lifecycle events (ConsumerStats.scala:11-61). In
  * Spark those observations arrive as query-lifecycle events and per-batch
  * `StreamingQueryProgress`:
  *
  *  - reportInitialization        -> onQueryStarted
  *  - reportShutdown              -> onQueryTerminated (exception => failed)
  *  - trackRecord / batchEnqueue  -> progress.numInputRows per batch
  *  - checkpointAcked             -> each completed batch (epoch commit)
  *  - recordNrOfInFlightRecords   -> stateOperators numRowsTotal (gauge)
  *
  * Thread-safe: listener callbacks fire on the streaming listener bus.
  */
final class GraftStats extends StreamingQueryListener {
  val started = new AtomicBoolean(false)
  val terminated = new AtomicBoolean(false)
  val failed = new AtomicBoolean(false)
  val batches = new AtomicLong(0) // checkpointAcked analog: committed epochs
  val rows = new AtomicLong(0)    // trackRecord analog
  // per-query identity, like the reference's per-consumer stats instance
  // (reportInitialization/reportShutdown know WHICH consumer): lets a
  // caller assert a SPECIFIC query was observed, not just that the
  // cumulative flags are set
  val startedIds = java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
  val terminatedIds = java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
    started.set(true)
    startedIds.add(e.id)
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    batches.incrementAndGet()
    rows.addAndGet(e.progress.numInputRows)
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    terminated.set(true)
    terminatedIds.add(e.id)
    if (e.exception.isDefined) failed.set(true)
  }
}
