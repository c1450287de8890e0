package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-element 60-bit MD5 prefix kernel: for each string in the
  * array, the value of the first 15 hex digits of its MD5 — i.e. the top
  * 60 bits of the digest — exactly
  * `transform(xs, x -> cast(conv(substring(md5(x),1,15),16,10) as long))`,
  * the feature-hash step of d5/d12's SimHash (pinned bit-identical by
  * Md5Prefix64Spec).
  *
  * The composed form routes every element through an interpreted lambda
  * that builds a 32-char lowercase hex string, substrings it, and re-parses
  * it base-16. Here one thread-cached MessageDigest hashes the raw UTF-8
  * bytes and the prefix is assembled from the first 8 digest bytes
  * directly (big-endian, dropping the low nibble) — no hex round-trip, no
  * per-element lambda dispatch, one primitive long[] out.
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_prefix64 requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)

  /** Shared by eval and codegen: the whole per-row loop. */
  def compute(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n)
    val md = Md5Prefix64.digest.get()
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        md.reset()
        val d = md.digest(xs.getUTF8String(i).getBytes)
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        out(i) = v >>> 4 // first 15 hex digits = top 60 bits
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5prefix", this, classOf[Md5Prefix64].getName)
    nullSafeCodeGen(ctx, ev, xs => s"${ev.value} = $self.compute($xs);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

object Md5Prefix64 {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def md5Prefix64(xs: Column): Column =
    ColumnBridge.column(Md5Prefix64(ColumnBridge.expression(xs)))
}
