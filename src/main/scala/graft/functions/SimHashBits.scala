package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native SimHash majority-vote kernel: given the feature hashes of a
  * document (array<long>), computes the `bits`-bit fingerprint whose bit j
  * is set iff at least half the feature hashes have bit j set
  * (`2*count_j >= n` — the exact rule of the composed
  * `aggregate(transform(sequence(...)))` form it replaces, including the
  * all-bits-set convention for an empty feature array, so fingerprints are
  * bit-identical).
  *
  * The composed form is an interpreted higher-order chain: per row it
  * allocates a `sequence(0, bits-1)` array and runs bits × |features|
  * lambda dispatches through a nested `filter`. Here the bit counters live
  * in one int[] inside whole-stage codegen — one fused O(n·bits) loop, no
  * intermediate arrays. Mirrors the reference's single-pass fingerprint
  * kernels in spirit (kcl-akka-stream has no corpus ops; pattern follows
  * [[MinHashSignature]]).
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 63, "simhash width must fit a signed long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_bits requires array<bigint>, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        cnt(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (2 * cnt(j) >= n) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt"); val h = ctx.freshName("h"); val fp = ctx.freshName("fp")
      s"""
         |int $n = $hs.numElements();
         |int[] $cnt = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $cnt[$j] += (int) (($h >>> $j) & 1L);
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if (2 * $cnt[$j] >= $n) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def simhashBits(hs: Column, bits: Int): Column =
    ColumnBridge.column(SimHashBits(ColumnBridge.expression(hs), bits))
}
