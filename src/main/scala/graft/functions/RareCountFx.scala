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

  private val bits = java.lang.Integer.numberOfTrailingZeros(width)

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
        if (est * rareDen < total) nRare += 1L
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
