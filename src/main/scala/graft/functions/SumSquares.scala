package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sum of squares of a double array — the per-VECTOR half of the
  * decomposed cosine (see [[DotProduct]]): computed once per vector in
  * the scan projection and carried through the pair join, so the
  * quadratic pair stage pays only the dot product. The accumulation is
  * sequential in index order — exactly [[CosineSimilarity]]'s norm
  * accumulator — so `dot / (sqrt(ss_a) * sqrt(ss_b))` reproduces the
  * fused kernel bit-for-bit on equal-length inputs (CosinePartsSpec).
  */
case class SumSquares(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sum_squares requires array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); ss += v * v; i += 1 }
    ss
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val ss = ctx.freshName("ss"); val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $x.getDouble($i);
         |  $ss += $v * $v;
         |}
         |${ev.value} = $ss;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumSquares =
    copy(child = newChild)

  override def prettyName: String = "sum_squares"
}

object SumSquares {
  /** `sumSquares(v)` as a Column. */
  def sumSquares(v: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SumSquares(org.apache.spark.sql.graftbridge.ColumnBridge.expression(v)))
}
