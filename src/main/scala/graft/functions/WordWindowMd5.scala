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

/** Fused w-word sliding-window MD5 kernel for d28's duplicate-substring
  * detection: for each window of `w` consecutive space-separated tokens,
  * the top 60 bits of the MD5 of the window STRING — bit-identical to
  * `md5_prefix64(transform(sequence(0, size(ws)-w), i ->
  * concat_ws(' ', slice(ws, i+1, w))))` over `ws = split(text, ' ')`
  * (pinned by WordWindowMd5Spec).
  *
  * The composed form materializes one window string PER TOKEN — each a
  * fresh w-word concat routed through an interpreted higher-order
  * lambda — so a 1k-token document allocates ~1k × w-word strings
  * before hashing anything. The fusion rests on an exactness property
  * of `split`: splitting on single spaces partitions the byte sequence
  * such that re-joining any token run with single spaces reproduces the
  * ORIGINAL bytes verbatim (empty tokens from doubled spaces included).
  * Every window string is therefore a contiguous byte RANGE of the
  * input, and the kernel hashes ranges in place: one pass to index the
  * separator positions, then one thread-cached MessageDigest call per
  * window — zero window allocations, no hex round-trip (prefix
  * assembled from the first 8 digest bytes, exactly [[Md5Prefix64]]).
  *
  * Inputs with fewer than w tokens produce an empty array — callers
  * filter those out first, as d28 does.
  */
case class WordWindowMd5(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, s"window width must be positive, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_window_md5 requires string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Shared by eval and codegen: the whole per-row loop. */
  def compute(input: UTF8String): ArrayData = {
    val ghs = WordWindowMd5.gramHashes(input, w)
    new GenericArrayData(ghs.map(x => x: Any))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordwindow", this, classOf[WordWindowMd5].getName)
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $self.compute($str);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordWindowMd5 =
    copy(child = newChild)
}

object WordWindowMd5 {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** The gram-hash pass itself — the d28 gram IDENTITY, shared by this
    * kernel and [[WinnowMd5]] (d52/d53/d61 depend on winnow grams being
    * exactly these hashes; one shared pass means a tokenization or hash
    * change cannot silently diverge them). Empty array for inputs with
    * fewer than `w` tokens.
    */
  private[functions] def gramHashes(input: UTF8String, w: Int): Array[Long] = {
    val bytes = input.getBytes
    val len = bytes.length
    // token boundaries: a 0x20 byte never occurs inside a multi-byte
    // UTF-8 sequence, so scanning raw bytes is exact. split semantics:
    // n_tokens = n_separators + 1, empty tokens included.
    var nSep = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) nSep += 1; i += 1 }
    val n = nSep + 1
    if (n < w) return Array.emptyLongArray
    // starts(j) = first byte of token j; ends(j) = one past its last byte
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    starts(0) = 0
    var tok = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { ends(tok) = i; tok += 1; starts(tok) = i + 1 }
      i += 1
    }
    ends(tok) = len
    val md = digest.get()
    val out = new Array[Long](n - w + 1)
    var j = 0
    while (j <= n - w) {
      val off = starts(j)
      md.reset()
      md.update(bytes, off, ends(j + w - 1) - off)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(j) = v >>> 4 // first 15 hex digits = top 60 bits
      j += 1
    }
    out
  }

  def wordWindowMd5(text: Column, w: Int): Column =
    ColumnBridge.column(WordWindowMd5(ColumnBridge.expression(text), w))
}
