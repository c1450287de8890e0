package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `double_order_bits(d)`: the IEEE-754 bit pattern of a double mapped
  * so that signed-long comparison agrees with double comparison
  * (negatives flip their magnitude bits: b XOR ((b >> 63) & 2^63-1)).
  * Exact and injective — no scaling, no rounding — which is what lets a
  * LONG-keyed bounded selection aggregate ([[BottomKPairs]]) rank
  * double scores with ties and order bit-identical to a sort on the
  * doubles themselves. For the ADC family's nonnegative distances the
  * mapping is the identity on raw bits. NaN (never produced by the
  * callers' sums of squares) maps above +Infinity, the total-order
  * convention.
  */
case class DoubleOrderBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"double_order_bits requires double, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    DoubleOrderBits.bitsOf(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DoubleOrderBits.bitsOf($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleOrderBits =
    copy(child = newChild)

  override def prettyName: String = "double_order_bits"
}

object DoubleOrderBits {
  def bitsOf(d: Double): Long = {
    val b = java.lang.Double.doubleToRawLongBits(d)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  def bits(c: Column): Column =
    ColumnBridge.column(DoubleOrderBits(ColumnBridge.expression(c)))
}
