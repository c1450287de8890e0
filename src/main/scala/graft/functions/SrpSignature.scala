package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native sign-random-projection (SRP) LSH signature kernel: given a dense
  * `array<double>` vector, returns one packed band key per band, where each
  * key is `bitsPerBand` sign bits of the vector's dot products with fixed
  * pseudo-random hyperplanes (Charikar's SRP family: P[bit_a = bit_b] =
  * 1 - angle(a,b)/pi for rotationally-symmetric planes; the uniform
  * [-1, 1) components used here are a standard practical stand-in whose
  * collision curve separates the regimes this operator targets — near-1.0
  * cosine duplicates vs a <=0.6 background).
  *
  * The hyperplane matrix (`bands*bitsPerBand` x `dim`) is derived
  * deterministically from `seed` via splitmix64 at expression construction
  * and shipped to executors as one reference array — no per-row hyperplane
  * generation, no driver state, and two sessions with the same seed band
  * identically. Vectors shorter than `dim` project on their prefix; longer
  * ones use the first `dim` components.
  *
  * A composed form would need `bands*bitsPerBand` interpreted
  * `aggregate(zip_with(...))` passes per row (CodegenFallback); this is one
  * fused whole-stage-codegen loop, the same preference-order-(b) treatment
  * as [[MinHashSignature]] / [[CosineSimilarity]].
  */
case class SrpSignature(child: Expression, bands: Int, bitsPerBand: Int,
    dim: Int, seed: Long) extends UnaryExpression {

  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 62 && dim > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"srp_signature requires array<double>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Hyperplane components, row-major by global bit then dimension:
    * planes(j * dim + d) for bit j in [0, bands*bitsPerBand), each an
    * iid-ish uniform in [-1, 1) from splitmix64(seed, j, d).
    */
  private lazy val planes: Array[Double] = SrpSignature.planes(bands * bitsPerBand, dim, seed)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val keys = new Array[Long](bands)
    var j = 0
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < bitsPerBand) {
        var dot = 0.0
        val base = j * dim
        var d = 0
        while (d < n) { dot += v.getDouble(d) * planes(base + d); d += 1 }
        key = (key << 1) | (if (dot >= 0.0) 1L else 0L)
        r += 1; j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val keys = ctx.freshName("keys")
      val b = ctx.freshName("b"); val r = ctx.freshName("r"); val d = ctx.freshName("d")
      val j = ctx.freshName("j"); val key = ctx.freshName("key"); val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $keys = new long[$bands];
         |int $j = 0;
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $r = 0; $r < $bitsPerBand; $r++, $j++) {
         |    double $dot = 0.0;
         |    int $base = $j * $dim;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dot += $v.getDouble($d) * $planesRef[$base + $d];
         |    }
         |    $key = ($key << 1) | ($dot >= 0.0 ? 1L : 0L);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

object SrpSignature {
  private def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic hyperplane matrix for (numBits, dim, seed) — exposed so
    * specs can pin the kernel against an independently-computed reference.
    */
  def planes(numBits: Int, dim: Int, seed: Long): Array[Double] = {
    val out = new Array[Double](numBits * dim)
    var j = 0
    while (j < numBits) {
      var d = 0
      while (d < dim) {
        val h = splitmix64(seed + j.toLong * 1000003L + d)
        // top 53 bits -> uniform [0, 1), then affine to [-1, 1)
        out(j * dim + d) = ((h >>> 11) * 1.1102230246251565e-16) * 2.0 - 1.0
        d += 1
      }
      j += 1
    }
    out
  }

  /** Column-API entry point: packed SRP band keys for a double vector. */
  def srpSignature(v: Column, bands: Int, bitsPerBand: Int, dim: Int, seed: Long): Column =
    ColumnBridge.column(
      SrpSignature(ColumnBridge.expression(v), bands, bitsPerBand, dim, seed))
}
