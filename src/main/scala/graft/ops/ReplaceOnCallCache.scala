package graft.ops

import org.apache.spark.sql.DataFrame

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

  /** Persist `df` (if not already) and make it this site's one live
    * cache, unpersisting the previous occupant.
    */
  def register(df: DataFrame): DataFrame = synchronized {
    // an already-cached plan (e.g. a spec re-running the op on the same
    // input) is adopted as-is — persist() again would only log a
    // CacheManager warning
    val cached =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.persist()
      else df
    last.filter(_ ne cached).foreach(_.unpersist(blocking = false))
    last = Some(cached)
    cached
  }

  /** Free the slot (no-op when none is live). */
  def release(): Unit = synchronized {
    last.foreach(_.unpersist(blocking = false))
    last = None
  }
}
