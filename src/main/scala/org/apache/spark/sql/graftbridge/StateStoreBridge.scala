package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Bridge into `private[sql]` state-store lifecycle control. The bench
  * harness runs ~39 streaming queries in one JVM; every query's
  * state-store providers stay pinned in `StateStore.loadedProviders`
  * (keyed by its fresh-per-run checkpoint dir, never evicted on query
  * stop), so without an explicit unload the harness accumulates heap that
  * inflates later timings. `unloadAll` is exactly what Spark itself calls
  * on executor shutdown — safe between queries when nothing is running.
  */
object StateStoreBridge {
  def unloadAll(): Unit = StateStore.unloadAll()
}
