package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused character-n-gram MinHash signature: slides an n-char window over
  * the string, hashes each window in place (FNV-1a over the chars, folded
  * into [0, p)), and keeps the k affine-permutation minima
  * ((a_i·h + b_i) mod p, exactly [[MinHashSignature]]'s arithmetic) — all
  * in one O(len·k) register loop.
  *
  * The composed alternative materializes the gram ARRAY
  * (len n-char string allocations per document), dedups it, and runs an
  * interpreted lambda per gram for the base hash — at corpus scale that
  * array dwarfs the documents themselves. Fusing is semantically free:
  * the base hash only drives candidate RECALL (pairs are verified with
  * exact gram-set Jaccard downstream), and MinHash minima over a multiset
  * equal the minima over its distinct set, so skipping the dedup changes
  * nothing.
  *
  * Strings shorter than n produce the empty-set signature (all
  * Long.MaxValue) — callers should filter those out first, as d14 does.
  */
case class CharGramMinHash(child: Expression, n: Int,
    seedsA: Seq[Long], seedsB: Seq[Long], p: Long)
    extends UnaryExpression {

  require(n >= 1 && seedsA.length == seedsB.length && seedsA.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"chargram_minhash requires string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def k = seedsA.length
  private val aArr = seedsA.toArray
  private val bArr = seedsB.toArray

  /** Shared by eval and codegen: the whole per-row loop. */
  def compute(input: UTF8String): ArrayData = {
    val s = input.toString
    val mins = Array.fill(k)(Long.MaxValue)
    val last = s.length - n
    var i = 0
    while (i <= last) {
      // FNV-1a over the window's chars, then fold into [0, p)
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        h = (h ^ s.charAt(i + j)) * 0x100000001b3L
        j += 1
      }
      val base = java.lang.Long.remainderUnsigned(h, p)
      var m = 0
      while (m < k) {
        val v = (base * aArr(m) + bArr(m)) % p
        if (v < mins(m)) mins(m) = v
        m += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("chargram", this, classOf[CharGramMinHash].getName)
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $self.compute($str);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramMinHash =
    copy(child = newChild)
}

object CharGramMinHash {
  def charGramMinhash(text: Column, n: Int,
      seedsA: Seq[Long], seedsB: Seq[Long], p: Long): Column =
    ColumnBridge.column(CharGramMinHash(ColumnBridge.expression(text), n, seedsA, seedsB, p))
}
