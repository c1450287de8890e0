package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded bottom-k selection average for the Min-K% screen family
  * (d67/s23): given a document's per-bigram score-term array, select the
  * k = max(1, len div `denom`) SMALLEST terms and return their exact
  * fixed-point average floor(sum·2^20 / k) — bit-identical to the
  * composed `aggregate(slice(array_sort(ts), 1, k), ...)` + Euclidean
  * fxAvg form it replaces (sum of the k-smallest multiset is order- and
  * tie-independent; the average uses the same truncating two-step split
  * `q·2^20 + (r·2^20) div k`, every intermediate under 2^51 for any
  * document length).
  *
  * Why a kernel and not the composed form: `array_sort` pays a full
  * O(t log t) comparison sort PLUS a sorted-copy allocation per
  * document, and it was the Min-K family's entire residual constant at
  * far scale once training was cached (s23 85.4 s warm at 64x, ~all of
  * it this sort — the reference's hot-loop discipline is that
  * per-record work does only what the record needs,
  * RecordProcessorImpl.scala:73-78). This kernel quickselects in-place
  * over one primitive copy — O(t) average, no comparator boxing, no
  * second array — and derives k from the array length INSIDE the
  * kernel, so the expression tree holds exactly ONE reference to the
  * terms array: the fxAvg single-reference discipline enforced
  * structurally (under predicate pushdown the streamed gate inlines
  * this expression into its filter condition; a k-outside form would
  * re-derive `size(hws)` — and with it the whole document hash pass —
  * three more times).
  *
  * An empty array returns 0 (the old fold's value: empty slice, zero
  * accumulator, k clamped to 1) so pushdown-reordered evaluation on
  * sub-2-token documents stays defined; the callers filter those out
  * before ranking. Null elements cannot occur (terms are arithmetic
  * over non-null word hashes) but are skipped defensively, shrinking
  * the effective length.
  */
case class BottomKAvgFx(child: Expression, denom: Int)
    extends UnaryExpression {

  require(denom >= 1, s"denom must be positive: $denom")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bottom_k_avg_fx requires array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  /** Shared by eval and codegen. */
  def compute(arr: ArrayData): Long = {
    val n0 = arr.numElements()
    var len = 0
    val a = new Array[Long](n0)
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) { a(len) = arr.getLong(i); len += 1 }
      i += 1
    }
    if (len == 0) return 0L
    val k = math.max(1, len / denom)
    if (k < len) BottomKAvgFx.selectBottomK(a, len, k)
    var sum = 0L
    i = 0
    while (i < k) { sum += a(i); i += 1 }
    // exact floor(sum * 2^20 / k) without overflow: sum < 2^48 for any
    // document (terms < 2^28, len < 2^20), r < k <= len, r*2^20 < 2^40
    val q = sum / k
    val r = sum % k
    q * 1048576L + r * 1048576L / k
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bottomKAvgFx", this, classOf[BottomKAvgFx].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BottomKAvgFx =
    copy(child = newChild)

  override def prettyName: String = "bottom_k_avg_fx"
}

object BottomKAvgFx {
  /** In-place quickselect partition of `a[0, len)` so `a[0, k)` holds the
    * k smallest values (multiplicity-correct; internal order
    * unspecified). Median-of-3 pivot with an insertion-sort tail — the
    * natural score arrays (md5-hashed bucket counts) carry no adversarial
    * order, so average O(len); worst case degrades gracefully and memory
    * stays the one primitive array either way.
    */
  private[functions] def selectBottomK(a: Array[Long], len: Int, k: Int): Unit = {
    var lo = 0
    var hi = len - 1
    while (hi - lo > 16) {
      // median-of-3 pivot into a(lo)
      val mid = lo + (hi - lo) / 2
      if (a(mid) < a(lo)) swap(a, lo, mid)
      if (a(hi) < a(lo)) swap(a, lo, hi)
      if (a(hi) < a(mid)) swap(a, mid, hi)
      val pivot = a(mid)
      // Hoare partition
      var i = lo - 1
      var j = hi + 1
      var done = false
      var p = 0
      while (!done) {
        do i += 1 while (a(i) < pivot)
        do j -= 1 while (a(j) > pivot)
        if (i >= j) { p = j; done = true }
        else swap(a, i, j)
      }
      // a[lo..p] <= pivot <= a[p+1..hi]; iterate into the side holding
      // the k-th position (absolute index k-1)
      if (k - 1 <= p) hi = p else lo = p + 1
    }
    // insertion-sort the remaining window; a[0, k) is then exact
    var i = lo + 1
    while (i <= hi) {
      val v = a(i)
      var j = i - 1
      while (j >= lo && a(j) > v) { a(j + 1) = a(j); j -= 1 }
      a(j + 1) = v
      i += 1
    }
  }

  @inline private def swap(a: Array[Long], i: Int, j: Int): Unit = {
    val t = a(i); a(i) = a(j); a(j) = t
  }

  /** `bottom_k_avg_fx(ts)` as a Column. */
  def bottomKAvgFx(ts: Column, denom: Int): Column =
    ColumnBridge.column(BottomKAvgFx(ColumnBridge.expression(ts), denom))
}
