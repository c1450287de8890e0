package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** The fused rare-token counter for the d73/s24 gate: given a
  * document's word array and the trained Count-Min history sketch,
  * hash each token once (the corpus-wide 60-bit md5 prefix — the
  * [[Md5Prefix64]] convention, bit-identical to the SQL chain), read
  * its three-row CMS minimum from the counters, and count the tokens
  * whose estimate times `rareDen` falls below the history's total —
  * exactly
  * `size(filter(transform(ws, tokenHash), h -> cmsEstimate(h)*rareDen < total))`,
  * with multiplicity, replayed by the unchanged DuckDB oracle.
  *
  * Why a kernel (the [[LmScoreFx]] argument, applied to the CMS gate):
  * the composed form routes every token through three nested
  * interpreted higher-order functions and a 32-char hex round-trip per
  * hash, and the s24 gate's predicate pushdown inlines the whole
  * expression into its filter condition — the kernel holds the ONE
  * structural reference to the words array, hashes raw UTF-8 bytes
  * through a thread-cached digest, and probes the counters as plain
  * array reads inside whole-stage codegen. The sketch (depth·width
  * longs, 96 KB at the gate geometry) rides as expression state, not a
  * literal tree.
  *
  * Bucket math is the oracle's: row j probes
  * `counters[j*width + ((h >> (bits*j)) mod width)]` — disjoint
  * `bits`-bit slices of the 60-bit hash (width = 2^bits), min over
  * rows. Null tokens cannot occur (`words()` splits a non-null
  * string) and are skipped defensively.
  */
case class RareCountFx(child: Expression, cms: Array[Long], total: Long,
    rareDen: Long, width: Int, depth: Int) extends UnaryExpression {

  require(width > 0 && (width & (width - 1)) == 0, s"width must be a power of two: $width")
  require(depth >= 1 && cms.length == width * depth,
    s"counter length ${cms.length} != width $width x depth $depth")
  require(rareDen >= 1 && total >= 0, s"need rareDen >= 1, total >= 0: $rareDen / $total")

  private val bits = java.lang.Integer.numberOfTrailingZeros(width)

  /** `est * rareDen < total` rewritten overflow-free: the product form
    * wraps Long once a counter nears 2^63/rareDen (2^55 at the gate's
    * rareDen = 256), silently flipping the strict predicate (ADVICE
    * r13). For any est >= 0, total >= 0, rareDen >= 1 it is the same
    * integer predicate as `est < ceil(total / rareDen)` — no
    * overflowable product, hoisted out of the loop.
    */
  private val rareBelow = total / rareDen + (if (total % rareDen != 0) 1L else 0L)

  // Array fields compare by REFERENCE under the synthesized case-class
  // equals, so Catalyst structural comparison (semanticEquals, subtree
  // canonicalization, plan-cache keys) would treat two kernels built by
  // separate calls over identical trained sketches as distinct — the
  // streamed s24 gate re-plans per micro-batch and re-builds the kernel
  // each time (ADVICE r13). Compare contents.
  override def equals(other: Any): Boolean = other match {
    case that: RareCountFx =>
      child == that.child && total == that.total && rareDen == that.rareDen &&
        width == that.width && depth == that.depth &&
        java.util.Arrays.equals(cms, that.cms)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, java.lang.Long.valueOf(total), java.lang.Long.valueOf(rareDen),
    Integer.valueOf(width), Integer.valueOf(depth),
    Integer.valueOf(java.util.Arrays.hashCode(cms)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rare_count_fx requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  /** Shared by eval and codegen: hash, probe, count. */
  def compute(ws: ArrayData): Long = {
    val n = ws.numElements()
    val md = RareCountFx.digest.get()
    var nRare = 0L
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        md.reset()
        val d = md.digest(ws.getUTF8String(i).getBytes)
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        val h = v >>> 4
        var est = Long.MaxValue
        j = 0
        while (j < depth) {
          val c = cms(j * width + ((h >>> (bits * j)) & (width - 1)).toInt)
          if (c < est) est = c
          j += 1
        }
        if (est < rareBelow) nRare += 1L
      }
      i += 1
    }
    nRare
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rareCountFx", this, classOf[RareCountFx].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RareCountFx =
    copy(child = newChild)

  override def prettyName: String = "rare_count_fx"
}

object RareCountFx {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** `rare_count_fx(ws)` as a Column. */
  def rareCountFx(ws: Column, cms: Array[Long], total: Long, rareDen: Long,
      width: Int, depth: Int): Column =
    ColumnBridge.column(RareCountFx(ColumnBridge.expression(ws), cms, total,
      rareDen, width, depth))
}
