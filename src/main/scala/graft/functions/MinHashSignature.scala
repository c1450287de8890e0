package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native MinHash signature kernel: given the base hashes of a document's
  * shingles (array<long>, each in [0, p)), computes the k minima of the
  * affine permutations (a_i*h + b_i) mod p in one fused loop.
  *
  * The composed form — one `array_min(transform(hs, ...))` per hash
  * function — evaluates k interpreted lambda passes per row
  * (higher-order functions are CodegenFallback): ~k*|shingles| virtual
  * dispatches and k intermediate arrays. Here the k accumulators live in
  * registers inside whole-stage codegen; the arithmetic is identical, so
  * signatures (and therefore LSH candidates) are unchanged.
  */
case class MinHashSignature(child: Expression, seedsA: Seq[Long], seedsB: Seq[Long], p: Long)
    extends UnaryExpression {

  require(seedsA.length == seedsB.length && seedsA.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature requires array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def k = seedsA.length

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * seedsA(j) + seedsB(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("seedsA", seedsA.toArray, "long[]")
    val bRef = ctx.addReferenceObj("seedsB", seedsB.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val mins = ctx.freshName("mins"); val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $n = $hs.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($h * $aRef[$j] + $bRef[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def minhashSignature(hs: Column, seedsA: Seq[Long], seedsB: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hs), seedsA, seedsB, p))
}
