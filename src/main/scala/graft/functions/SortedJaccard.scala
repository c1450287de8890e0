package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact Jaccard of two SORTED DISTINCT long-array sets in one
  * allocation-free merge: `|A ∩ B| / (|A| + |B| − |A ∩ B|)` — the
  * arithmetic of the streaming near-dup trackers' in-state verify
  * (`inter.toDouble / (la + lb − inter)`, one double division of exact
  * int64 operands, so the value is engine-independent), lifted into a
  * projection expression so the verify can run in a JOIN stage over a
  * doc-keyed gram-set side table instead of inside per-bucket state
  * (the s8/s12 side-table layout — the state store then holds doc IDS,
  * not gram arrays, and the banding shuffle stops replicating every
  * document's grams once per band).
  *
  * Inputs MUST be sorted ascending and distinct — `bandedGramRows`' /
  * `sortedGramSets`' delivery contract (spec-pinned there); the merge
  * is silently wrong on unsorted input, exactly like the trackers'
  * merge. Both-empty yields 0.0 (never produced by the banding scan,
  * which floors documents at one shingle); null input yields null.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // containsNull=true is rejected, not tolerated: compute() reads slots
    // via ArrayData.getLong, which returns 0 for a null slot — silently
    // wrong output (a phantom 0L element) instead of a type error. The
    // producers (sortedGramSets / bandedGramRows) emit non-null elements.
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, false) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard requires array<bigint> (non-null elements) inputs, " +
        s"got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  /** Shared by eval and codegen. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val a = x.getLong(i); val b = y.getLong(j)
      if (a == b) { inter += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sortedJaccard", this, classOf[SortedJaccard].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $self.compute($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_jaccard"
}

object SortedJaccard {
  /** `sortedJaccard(a, b)` as a Column. */
  def sortedJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(SortedJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
