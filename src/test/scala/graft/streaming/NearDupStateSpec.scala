package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the side-table near-dup layout's STATE BOUNDS (r15 verdict
  * item 5: "does the cross-band candidate-dedup term bend at scale?").
  * The layout holds two stores: the LSH bucket-id store (one row per
  * (doc, band) — linear by construction) and the cross-band candidate
  * dedup, whose worst case is C(k,2) per hot bucket. The committed r16
  * far-point table (OPTIMIZATION_r16.md §state) measured 1×→16×:
  *
  *   s8  dedupe  3,257 → 49,239   (15.1×)   fMGWS 112,993 → 1,808,730 (16.0×)
  *   s12 dedupe  2,529 → 24,377   ( 9.6×)   fMGWS identical to s8
  *   s13 dedupe 15,820 → 172,344  (10.9×)   fMGWS 224,694 → 3,595,104 (16.0×)
  *
  * — the dedup term scales ≤ linearly on corpus-shaped data (LSH keeps
  * buckets cold; duplicate RATE, not count, is what the corpus fixes).
  * This spec pins the same two facts at gate scale so a banding change
  * that heats the buckets fails here first: bucket state ≤ docs × bands
  * exactly, and candidate-dedup state within a small constant per doc
  * (measured 0.51-0.65/doc across 1×-16×; 4/doc is the alarm line).
  * The genuinely-hot-bucket case stays the TTL'd boundedNearDupPairs
  * form's job (BoundedNearDupPropSpec pins its plateau).
  */
class NearDupStateSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Bands = 24 // CorpusOps banding geometry (48 hashes, 24 bands of 2)

  test("s8's two state stores stay linear: buckets = docs x bands, dedup ~ O(docs)") {
    val perOp = scala.collection.mutable.Map.empty[String, Long]
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        e.progress.stateOperators.foreach { op =>
          perOp(op.operatorName) = math.max(perOp.getOrElse(op.operatorName, 0L), op.numRowsTotal)
        }
    }
    spark.streams.addListener(l)
    try StreamingQueries.s8StreamNearDup(spark, sf01).collect()
    finally spark.streams.removeListener(l)
    val docs = graft.Tables.documents(spark, sf01).count()
    val buckets = perOp.getOrElse("flatMapGroupsWithState", 0L)
    val dedup = perOp.getOrElse("dedupe", 0L)
    withClue(s"perOp=$perOp docs=$docs") {
      buckets should be > 0L
      buckets should be <= docs * Bands
      dedup should be <= docs * 4
    }
  }
}
