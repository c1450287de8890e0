package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** One live function-owned persist() per call site — the
  * `VectorOps.annIvfOverCells` replace-on-next-call lifetime contract
  * extracted for every op that must cache an intermediate the caller
  * never sees (a returned lazy DataFrame keeps referencing the cached
  * block, so the op itself cannot unpersist before the caller's final
  * action). Each call unpersists the PREVIOUS call's block and registers
  * the new one, bounding a long-lived session to at most one live cache
  * per site no matter how many times the op runs; a superseded call's
  * returned DataFrame stays correct — it recomputes from lineage, just
  * uncached. `release()` frees the slot deterministically (harness
  * `clearCache()` also covers it).
  */
private[graft] final class ReplaceOnCallCache {
  private var last: Option[DataFrame] = None
  private var lastOwned: Boolean = false

  /** Persist `df` (if not already) at `level` and make it this site's
    * one live cache, unpersisting the previous occupant IF this slot
    * persisted it. A frame that arrives already cached (Spark's cache is
    * keyed by PLAN, so this includes a caller-persisted equal plan, not
    * just a repeat run's new DataFrame object) is adopted un-owned: the
    * slot will never unpersist it, so a later call cannot silently drop
    * a cache the caller still relies on (r11 ADVICE).
    */
  def register(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = synchronized {
    val owned = df.storageLevel == StorageLevel.NONE
    // an already-cached plan is adopted as-is — persist() again would
    // only log a CacheManager warning
    val cached = if (owned) df.persist(level) else df
    // unpersist the previous occupant only if this slot persisted it AND
    // it is a DIFFERENT plan: a repeat call's new DataFrame object ADOPTS
    // the previous call's entry, and unpersisting through the old
    // reference would evict the very blocks just adopted (observed: a 3x
    // warm-run regression before this check)
    if (lastOwned)
      last.filter(p => !p.queryExecution.analyzed.sameResult(
          cached.queryExecution.analyzed))
        .foreach(_.unpersist(blocking = false))
    // a repeat-run adoption KEEPS ownership: the blocks came from this
    // slot's earlier persist, so the slot remains responsible for them
    lastOwned = owned ||
      (lastOwned && last.exists(p => p.queryExecution.analyzed.sameResult(
        cached.queryExecution.analyzed)))
    last = Some(cached)
    cached
  }

  /** The live occupant's storage level, for specs pinning persist tiers. */
  def currentLevel: Option[StorageLevel] = synchronized { last.map(_.storageLevel) }

  /** Free the slot — unpersists only a slot-owned occupant, never a
    * caller-owned adoption (no-op when none is live).
    */
  def release(): Unit = synchronized {
    if (lastOwned) last.foreach(_.unpersist(blocking = false))
    last = None
    lastOwned = false
  }
}
