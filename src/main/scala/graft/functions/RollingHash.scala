package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling-hash kernel (Rabin–Karp): folds
  * h = (h·base + codepoint) mod `mod` over the string's code points in one
  * pass. Bit-identical to the composed
  * `aggregate(transform(split(text, ''), c -> ascii(c)), ...)` form it
  * replaces (pinned by RollingHashSpec): `split` + `ascii` enumerate code
  * points with their values, exactly this loop — but as an interpreted
  * higher-order chain that materializes a per-character string array and
  * a per-character lambda dispatch per row. Here the accumulator lives in
  * a register inside whole-stage codegen and nothing is allocated.
  *
  * No overflow: acc < mod < 2^30 and base·acc + cp < 2^35 << Long.Max.
  */
case class RollingHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  require(mod > 1 && base > 0 && mod <= (1L << 31) && base <= (1L << 20),
    "base/mod must leave headroom for overflow-free long arithmetic")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_hash requires string, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val s = ctx.freshName("s"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $str.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * ${base}L + $cp) % ${mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def rollingHash(text: Column, base: Long = 31L, mod: Long = 1000000007L): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(text), base, mod))
}
