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
  *  - recordNrOfInFlightRecords   -> stateRowsTotal gauge (below)
  *  - recordNrOfProcessedUncheckpointedRecords -> stateRowsUpdated gauge
  *
  * The two state-depth gauges (ConsumerStats.scala:26-31) are the rows a
  * consumer is holding versus the rows touched since the last checkpoint
  * ack; Spark reports exactly those per batch in
  * `progress.stateOperators` — `numRowsTotal` is the state a restart
  * would restore (in-flight), `numRowsUpdated` the rows this epoch wrote
  * before its commit. Both are summed across the query's stateful
  * operators and published as last-observed gauges, the same overwrite
  * semantics as the reference's `recordNrOf*` hooks.
  *
  * Registered session-wide via the `streamingQueryListeners` static conf
  * (the reflective `ConsumerStats` config hook), so nothing here may grow
  * with listener lifetime: the per-query identity sets are bounded
  * ([[GraftStats.BoundedIdSet]] — newest [[GraftStats.IdCapacity]]
  * retained, oldest evicted), which covers their purpose (asserting a
  * RECENT query was observed) without leaking one UUID per query forever
  * in a long-lived session.
  *
  * Thread-safe: listener callbacks fire on the streaming listener bus.
  */
final class GraftStats extends StreamingQueryListener {
  import GraftStats._

  val started = new AtomicBoolean(false)
  val terminated = new AtomicBoolean(false)
  val failed = new AtomicBoolean(false)
  val batches = new AtomicLong(0) // checkpointAcked analog: committed epochs
  val rows = new AtomicLong(0)    // trackRecord analog
  // state-depth gauges (last observed; 0 until a stateful batch reports)
  val stateRowsTotal = new AtomicLong(0)   // recordNrOfInFlightRecords analog
  val stateRowsUpdated = new AtomicLong(0) // recordNrOfProcessedUncheckpointedRecords analog
  // per-query identity, like the reference's per-consumer stats instance
  // (reportInitialization/reportShutdown know WHICH consumer): lets a
  // caller assert a SPECIFIC query was observed, not just that the
  // cumulative flags are set. Bounded — see class doc.
  val startedIds = new BoundedIdSet(IdCapacity)
  val terminatedIds = new BoundedIdSet(IdCapacity)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
    started.set(true)
    startedIds.add(e.id)
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    batches.incrementAndGet()
    rows.addAndGet(e.progress.numInputRows)
    val ops = e.progress.stateOperators
    if (ops != null && ops.nonEmpty) {
      stateRowsTotal.set(ops.map(_.numRowsTotal).sum)
      stateRowsUpdated.set(ops.map(_.numRowsUpdated).sum)
    }
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    terminated.set(true)
    terminatedIds.add(e.id)
    if (e.exception.isDefined) failed.set(true)
  }
}

object GraftStats {

  /** Identity-set bound: far above any plausible concurrent-query count,
    * far below "one UUID per query for the life of the session".
    */
  val IdCapacity = 256

  /** Insertion-ordered set of query ids capped at `max` entries — oldest
    * evicted first (re-adding an id refreshes its position). Synchronized:
    * listener callbacks can race a reader thread.
    */
  final class BoundedIdSet(max: Int) {
    private val set = new java.util.LinkedHashSet[java.util.UUID]()
    def add(id: java.util.UUID): Unit = synchronized {
      set.remove(id)
      set.add(id)
      if (set.size > max) { val it = set.iterator(); it.next(); it.remove() }
    }
    def contains(id: java.util.UUID): Boolean = synchronized(set.contains(id))
    def size: Int = synchronized(set.size)
  }
}
