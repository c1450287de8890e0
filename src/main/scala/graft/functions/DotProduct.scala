package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two double arrays — the PAIR-STAGE half of the
  * decomposed cosine (see [[SumSquares]] for the per-vector half and
  * the bit-parity contract). [[CosineSimilarity]] accumulates the dot
  * product AND both squared norms per pair — 3 multiply-accumulates
  * per element; on quadratic pair stages the norms are a per-VECTOR
  * quantity being recomputed per PAIR. Carrying `sum_squares(v)`
  * through the pair replication and doing only the dot per pair cuts
  * the quadratic stage's element work 3x; the composed
  * `dot / (sqrt(na) * sqrt(nb))` (zero-guarded) is IEEE-bit-identical
  * to the fused kernel for equal-length arrays because each
  * accumulator runs the same FP ops in the same index order
  * (CosinePartsSpec pins it bit-for-bit, eval and codegen). This
  * expression is the REFERENCE form of that contract: the tile kernels
  * ([[BlockPairsFx]]) replay exactly this sequential fold for every
  * emitted pair (BlockPairsFxSpec pins the raw bits), which is what
  * keeps the pair families' DuckDB oracles hash-exact.
  *
  * Same conventions as [[CosineSimilarity]]: null ARRAY yields null;
  * mismatched lengths use the common prefix (note the parity contract
  * above requires equal lengths — embeddings are fixed-dim at every
  * call site, and [[SumSquares]] of the longer array would differ from
  * the fused kernel's prefix-bounded norm otherwise).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** `dotProduct(a, b)` as a Column. */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      DotProduct(org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))
}
