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
  * operators and published PER QUERY ([[stateRows]], keyed by query id) —
  * the reference's `recordNrOf*` hooks live on a per-consumer stats
  * instance, so a session-wide listener must keep per-query resolution
  * or two concurrent queries' depths would overwrite each other. The
  * unkeyed [[stateRowsTotal]]/[[stateRowsUpdated]] convenience gauges
  * keep the last-observed-any-query overwrite semantics and are only
  * meaningful in single-query sessions.
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
  // state-depth gauges (last observed; 0 until a stateful batch reports).
  // Unkeyed pair = last stateful progress from ANY query (single-query
  // convenience); the per-query map is the ConsumerStats-parity surface.
  val stateRowsTotal = new AtomicLong(0)   // recordNrOfInFlightRecords analog
  val stateRowsUpdated = new AtomicLong(0) // recordNrOfProcessedUncheckpointedRecords analog
  // query id -> (in-flight state rows, rows updated this epoch); bounded
  // like the identity sets (newest IdCapacity queries retained)
  val stateRows = new BoundedIdMap[(Long, Long)](IdCapacity)
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
      val total = ops.map(_.numRowsTotal).sum
      val updated = ops.map(_.numRowsUpdated).sum
      stateRowsTotal.set(total)
      stateRowsUpdated.set(updated)
      stateRows.put(e.progress.id, (total, updated))
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

  /** Insertion-ordered query-id map capped at `max` entries — oldest
    * evicted first (updating an id refreshes its position). Same bound
    * discipline as [[BoundedIdSet]]: the listener is session-lived, so
    * nothing here may grow with queries-ever-started.
    */
  final class BoundedIdMap[V](max: Int) {
    private val m = new java.util.LinkedHashMap[java.util.UUID, V]()
    def put(id: java.util.UUID, v: V): Unit = synchronized {
      m.remove(id)
      m.put(id, v)
      if (m.size > max) { val it = m.keySet().iterator(); it.next(); it.remove() }
    }
    def get(id: java.util.UUID): Option[V] = synchronized(Option(m.get(id)))
    def size: Int = synchronized(m.size)
  }
}
