package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing kernel for d52/d53: gram hashing ([[WordWindowMd5]]'s
  * byte-range MD5 pass, verbatim) PLUS the sliding-window-minimum
  * selection in one O(n) native pass — `(pos, gh)` of every selected
  * gram, where selection minimizes the packed key
  * `gh − gh mod 2^20 + (2^20−1−pos)` over each window of `winW`
  * consecutive grams (smallest hash high bits, RIGHTMOST position on
  * ties — winnowing's shift-invariant tiebreak).
  *
  * Why a kernel and not the composed column form
  * (transform/sequence/slice/array_min — kept as the spec reference in
  * `CorpusOps.winnowSelectedComposed`): Catalyst's
  * InferFiltersFromGenerate pins a `size(...) > 0` filter under the
  * explode that consumes this, and filter pushdown INLINES the
  * generator input's defining expression into that condition — the
  * composed form then re-evaluates the full interpreted selection
  * (lambdas, per-window slice allocations, plus the md5 pass) several
  * times per document: measured 13 s vs the kernel's sub-second at
  * sf0.1. The kernel makes re-evaluation cheap (one native pass) and
  * the selection loop allocation-free: a monotonic deque over the
  * packed keys — amortized O(1) per gram, no per-window work.
  *
  * Same-position minima repeat only CONSECUTIVELY across windows (a
  * smaller key at a lower position would have owned the earlier window
  * too), so emitting on front-change yields exactly the distinct
  * window-minima set.
  *
  * Inputs with fewer than `winW` grams produce an empty array (no full
  * selection window — the documented guarantee threshold). Documents at
  * ≥ 2^20 gram positions fail loudly: the packed tiebreak would wrap.
  */
case class WinnowMd5(child: Expression, gramW: Int, winW: Int) extends UnaryExpression {

  require(gramW >= 1, s"gram width must be positive, got $gramW")
  require(winW >= 1, s"winnow window must be positive, got $winW")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_md5 requires string, got $t")
  }

  override def dataType: DataType = ArrayType(
    new StructType().add("pos", LongType, nullable = false)
      .add("gh", LongType, nullable = false),
    containsNull = false)

  private val PosCap = 1L << 20

  /** Shared by eval and codegen: the whole per-row pass. */
  def compute(input: UTF8String): ArrayData = {
    // the gram pass is WordWindowMd5's, shared VERBATIM — d53/d61
    // depend on winnow grams being d28's exact gram identity
    val ghs = WordWindowMd5.gramHashes(input, gramW)
    val nGrams = ghs.length
    if (nGrams < winW) return new GenericArrayData(Array.empty[Any])
    if (nGrams >= PosCap) throw new IllegalStateException(
      s"winnow: document exceeds 2^20 gram positions ($nGrams)")
    // monotonic deque of gram indices, packed keys strictly increasing
    // front to back; front is the window minimum
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    def key(p: Int): Long = ghs(p) - (ghs(p) % PosCap) + (PosCap - 1 - p)
    val out = new java.util.ArrayList[Any](2 * nGrams / (winW + 1) + 4)
    var lastSel = -1
    var j = 0
    while (j < nGrams) {
      while (tail > head && key(dq(tail - 1)) > key(j)) tail -= 1
      dq(tail) = j; tail += 1
      if (dq(head) <= j - winW) head += 1
      if (j >= winW - 1 && dq(head) != lastSel) {
        lastSel = dq(head)
        out.add(new GenericInternalRow(
          Array[Any](lastSel.toLong, ghs(lastSel))): InternalRow)
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnow", this, classOf[WinnowMd5].getName)
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $self.compute($str);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMd5 =
    copy(child = newChild)
}

object WinnowMd5 {
  def winnowMd5(text: Column, gramW: Int, winW: Int): Column =
    ColumnBridge.column(WinnowMd5(ColumnBridge.expression(text), gramW, winW))
}
