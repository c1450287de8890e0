package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TWO independent 60-bit draws from ONE MD5: for a string `x`, the
  * values of hex digits 1-15 and 17-31 of `md5(x)` — i.e. the top 60
  * bits of digest bytes 0-7 and of bytes 8-15. Bit-identical to
  * `cast(conv(substring(md5(x),1,15),16,10) as long)` and
  * `cast(conv(substring(md5(x),17,15),16,10) as long)` (pinned by
  * Md5Slices60Spec), and in DuckDB to
  * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)` /
  * `CAST(('0x' || substr(md5(x), 17, 15)) AS BIGINT)`.
  *
  * Why: d50's schedule needs two independent per-document draws (the
  * temperature-sampling key and the interleave-order key). The r14 form
  * paid TWO full MD5s per document over salted strings plus two
  * hex-string round-trips (md5 → 32-char hex → substring → base-16
  * re-parse). One digest carries 128 bits — two disjoint 60-bit slices
  * are exactly as independent as two salted draws, at half the hash
  * cost and none of the hex traffic: one thread-cached MessageDigest
  * over the raw UTF-8 bytes, both longs assembled directly from digest
  * bytes. Returns `array<bigint>` (never null elements); null input
  * yields null.
  */
case class Md5Slices60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_slices60 requires string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Shared by eval and codegen. */
  def compute(s: UTF8String): GenericArrayData = {
    val md = Md5Slices60.digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var hi = 0L; var lo = 0L
    var j = 0
    while (j < 8) { hi = (hi << 8) | (d(j) & 0xffL); j += 1 }
    while (j < 16) { lo = (lo << 8) | (d(j) & 0xffL); j += 1 }
    // first 15 hex digits of each 8-byte half = its top 60 bits
    new GenericArrayData(Array[Any](hi >>> 4, lo >>> 4))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5slices", this, classOf[Md5Slices60].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $self.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Slices60 =
    copy(child = newChild)

  override def prettyName: String = "md5_slices60"
}

/** The scalar FIRST slice alone: the value of hex digits 1-15 of
  * `md5(x)` — bit-identical to
  * `cast(conv(substring(md5(x),1,15),16,10) as long)` (pinned by
  * Md5Slices60Spec) and to DuckDB's
  * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`, which is the
  * draw/hash convention every salted scheduling draw and scalar token
  * hash in the suite replays in its oracle. Replaces the composed
  * md5→32-hex-string→substring→base-16-parse chain (three string
  * allocations per row) with one digest over raw UTF-8 bytes and a
  * long assembled from the first 8 digest bytes — no array allocation
  * either, so it is safe on per-token exploded streams.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_prefix60 requires string, got $t")
  }

  override def dataType: DataType = LongType

  /** Shared by eval and codegen. */
  def compute(s: UTF8String): Long = {
    val md = Md5Slices60.digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var hi = 0L
    var j = 0
    while (j < 8) { hi = (hi << 8) | (d(j) & 0xffL); j += 1 }
    hi >>> 4 // first 15 hex digits = top 60 bits
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5prefix60", this, classOf[Md5Prefix60].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $self.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix60"
}

object Md5Slices60 {
  private[functions] val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** `md5Slices60(x)` as a Column: `array(top60(md5(x)), next60(md5(x)))`. */
  def md5Slices60(x: Column): Column =
    ColumnBridge.column(Md5Slices60(ColumnBridge.expression(x)))

  /** Scalar `md5Prefix60(x)` as a Column: `top60(md5(x))`. */
  def md5Prefix60(x: Column): Column =
    ColumnBridge.column(Md5Prefix60(ColumnBridge.expression(x)))
}
