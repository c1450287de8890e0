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
  // PER-SHARD gauges — the `ShardConsumerId(stream, app, shardId)` analog
  // (ShardConsumerId.scala:3-9): the reference keys its ConsumerStats
  // instance per shard, so a user debugging ONE hot shard can see it.
  // Populated from the `observedMetrics` a [[GraftStats.observeShardRows]]
  // tap emits per micro-batch (no side channel: the metric rides the
  // standard progress event, per query by construction).
  //  - shardRowsLastBatch: rows per shard in the LAST (most recently
  //    reported, i.e. still-uncommitted-at-report-time) epoch — the
  //    per-shard recordNrOfProcessedUncheckpointedRecords analog;
  //  - shardRowsTotal: cumulative rows per shard over the query's
  //    lifetime — the per-shard trackRecord counter.
  // Bounded: IdCapacity queries (LRU), map values O(shard count).
  val shardRowsLastBatch = new BoundedIdMap[Map[Int, Long]](IdCapacity)
  val shardRowsTotal = new BoundedIdMap[Map[Int, Long]](IdCapacity)
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
    // per-shard gauges from the observeShardRows tap (absent unless the
    // query was instrumented; empty batches report an empty map)
    val observed = e.progress.observedMetrics
    if (observed != null && observed.containsKey(ShardRowsMetric)) {
      val row = observed.get(ShardRowsMetric)
      val perShard = row.getAs[scala.collection.Map[Int, Long]](ShardRowsField).toMap
      shardRowsLastBatch.put(e.progress.id, perShard)
      val merged = shardRowsTotal.get(e.progress.id).getOrElse(Map.empty)
      val cumulative = perShard.foldLeft(merged) { case (acc, (s, n)) =>
        acc.updated(s, acc.getOrElse(s, 0L) + n)
      }
      shardRowsTotal.put(e.progress.id, cumulative)
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

  /** Name of the observed metric [[observeShardRows]] attaches and
    * [[GraftStats]] consumes, and its map field.
    */
  val ShardRowsMetric = "graft_shard_rows"
  val ShardRowsField = "rows_by_shard"

  /** Instrument a (streaming or batch) DataFrame with the per-shard row
    * tap: every micro-batch reports `map<shard, rows>` through the
    * standard `observedMetrics` channel, which [[GraftStats]] turns into
    * the per-shard consumer gauges. The tap is one
    * [[graft.functions.CountByKey]] aggregate folded into the batch's own
    * pass — no extra scan, no shuffle (CollectMetrics aggregates
    * partition-locally and merges O(shard count) maps on the driver), and
    * the data plane is untouched (observe is a planner no-op for the
    * result rows).
    */
  def observeShardRows(df: org.apache.spark.sql.DataFrame,
      shardCol: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
    df.observe(ShardRowsMetric,
      graft.functions.CountByKey.countByKey(shardCol).as(ShardRowsField))

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
