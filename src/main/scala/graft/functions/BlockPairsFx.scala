package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** The fused BLOCK-PAIR cosine kernels for the quadratic embedding pair
  * stages (d9/d46/d55/d58): instead of a join row PER PAIR — each
  * evaluated through the codegen'd but per-pair expression stack
  * (JoinedRow field extraction, filter, projection) — the pair stages
  * group each replicated side by its block-pair key (one row per block
  * per side, `collect_list` of (id, vector, norm², aux)) and a single
  * kernel call scores the whole B×B tile from primitive arrays:
  *
  *  - both sides convert ONCE per tile to `double[]` vectors with
  *    precomputed `sqrt(norm²)` (each vector is then read by ~B pair
  *    scores, so conversion is amortized to nothing), replacing ~B²
  *    UnsafeArrayData element reads with cache-resident primitive loops;
  *  - every pair is screened by a REASSOCIATED 4-accumulator dot
  *    product — ~4x the throughput of the strict sequential fold, whose
  *    loop-carried FP add latency is the stage's real floor — and only
  *    survivors pay the exact in-order fold;
  *  - the EMITTED similarity is always that exact sequential fold
  *    divided by `sqrt(na)*sqrt(nb)` (zero-guarded) — IEEE-bit-identical
  *    to the `cosineFromParts` composition it replaces, which is what
  *    keeps the DuckDB oracles hash-exact (BlockPairsFxSpec pins raw-bit
  *    equality against the composed form).
  *
  * EXACTNESS OF THE SCREEN (why fast-then-exact emits the identical
  * pair set): for dim-n doubles, any two summation orders of the same
  * n products differ by at most ~2n·eps·Σ|a_i·b_i| ≤ 2n·eps·√(na·nb)
  * (Cauchy–Schwarz), ≈ 3e-14·denom at n = 64 — so a pair rejected at
  * `fast < (thr − 1e-9)·denom` has exact-fold dot strictly below
  * thr·denom by five orders of magnitude more margin than the combined
  * reassociation + rounding error, and a pair inside the margin is
  * simply scored exactly. The same argument bounds the top-k shortlist
  * slack in SIM space (|sim| ≤ 1, absolute slack 2e-9): any candidate
  * excluded from the shortlist is provably outranked by k others on
  * the exact values, ties included (strictly larger sims win before
  * any id tie-break).
  *
  * SCALE: the grouped sides carry exactly the join's shuffle volume in
  * B-row batches (per-task memory one tile = 2·B vectors, the d9 block
  * contract); the aggregation reuses the join key's distribution, so
  * the plan's exchange count is unchanged.
  */
object BlockPairsFx {

  /** Relative screen margin — see the exactness argument above; ~1e5x
    * the worst-case reassociation error at dim 64 and still far below
    * any similarity structure in the data.
    */
  private[functions] val RelMargin = 1e-9

  /** One converted side of a tile. */
  private final class Block(val n: Int, val ids: Array[Long],
      val vecs: Array[Array[Double]], val sqrts: Array[Double],
      val aux: Array[Double])

  /** Input element type both kernels take (the collect_list struct). */
  private[functions] val inType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false)),
    StructField("n2", DoubleType, nullable = false),
    StructField("aux", DoubleType, nullable = false))), containsNull = false)

  private def toBlock(a: ArrayData): Block = {
    val n = a.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val sqrts = new Array[Double](n)
    val aux = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = a.getStruct(i, 4)
      ids(i) = r.getLong(0)
      vecs(i) = r.getArray(1).toDoubleArray()
      sqrts(i) = math.sqrt(r.getDouble(2))
      aux(i) = r.getDouble(3)
      i += 1
    }
    new Block(n, ids, vecs, sqrts, aux)
  }

  /** Reassociated 4-accumulator dot — the SCREEN, never emitted. */
  private def fastDot(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
    var i = 0
    while (i + 4 <= n) {
      d0 += x(i) * y(i); d1 += x(i + 1) * y(i + 1)
      d2 += x(i + 2) * y(i + 2); d3 += x(i + 3) * y(i + 3)
      i += 4
    }
    while (i < n) { d0 += x(i) * y(i); i += 1 }
    (d0 + d1) + (d2 + d3)
  }

  /** The exact in-order fold — bit-identical to [[DotProduct]]. */
  private def exactDot(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var d = 0.0
    var i = 0
    while (i < n) { d += x(i) * y(i); i += 1 }
    d
  }

  /** The exact emitted similarity — bit-identical to the composed
    * `when(denom === 0, 0.0).otherwise(dot_product(a, b) / denom)`.
    */
  private def exactSim(x: Array[Double], y: Array[Double], denom: Double): Double =
    if (denom == 0.0) 0.0 else exactDot(x, y) / denom

  /** Threshold mode: every qualifying unordered pair of the tile as
    * (a_id, b_id, sim, a_aux, b_aux), canonical a_id < b_id. `diag`
    * tiles (lo == hi: both lists hold the same block) iterate i < j
    * over ONE side — the unordered pair set is input-order-independent
    * either way.
    */
  private[functions] def pairsAbove(aArr: ArrayData, bArr: ArrayData,
      diag: Boolean, thr: Double): ArrayData = {
    val a = toBlock(aArr)
    val b = if (diag) a else toBlock(bArr)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < a.n) {
      val va = a.vecs(i)
      val sa = a.sqrts(i)
      var j = if (diag) i + 1 else 0
      while (j < b.n) {
        if (a.ids(i) != b.ids(j)) {
          val denom = sa * b.sqrts(j)
          val sim =
            if (denom == 0.0) 0.0
            else if (fastDot(va, b.vecs(j)) >= (thr - RelMargin) * denom)
              exactSim(va, b.vecs(j), denom)
            else Double.NegativeInfinity // screened out: provably < thr
          if (sim >= thr) {
            val row = new GenericInternalRow(5)
            if (a.ids(i) < b.ids(j)) {
              row.update(0, a.ids(i)); row.update(1, b.ids(j))
              row.update(3, a.aux(i)); row.update(4, b.aux(j))
            } else {
              row.update(0, b.ids(j)); row.update(1, a.ids(i))
              row.update(3, b.aux(j)); row.update(4, a.aux(i))
            }
            row.update(2, sim)
            out += row
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Top-k mode: per-side top-k DIRECTED candidates of the tile —
    * (q_id, n_id, sim) for every vector of each side over its partners
    * on the other side (diag tiles emit each vector once, partners =
    * the rest of the block). The union of these tile-local top-k lists
    * provably contains every vector's GLOBAL top-k (same comparator,
    * sim desc then n_id asc), so the downstream window sees 2·B·k rows
    * per tile instead of B².
    */
  private[functions] def topKPairs(aArr: ArrayData, bArr: ArrayData,
      diag: Boolean, k: Int): ArrayData = {
    val a = toBlock(aArr)
    val b = if (diag) a else toBlock(bArr)
    // fast-sim tile: fs(i)(j) — reused by the row sweep and (off-diag)
    // the column sweep; NaN marks the self pair so it never shortlists
    val fs = Array.ofDim[Double](a.n, b.n)
    var i = 0
    while (i < a.n) {
      var j = if (diag) i + 1 else 0
      while (j < b.n) {
        val denom = a.sqrts(i) * b.sqrts(j)
        val v =
          if (a.ids(i) == b.ids(j)) Double.NaN
          else if (denom == 0.0) 0.0
          else fastDot(a.vecs(i), b.vecs(j)) / denom
        fs(i)(j) = v
        if (diag) fs(j)(i) = v
        j += 1
      }
      if (diag) fs(i)(i) = Double.NaN
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val slack = 2 * RelMargin

    // shortlist row `row` of the fast tile against partner block `pb`,
    // exact-rescore, emit q's top-k by (sim desc, id asc)
    def emitSide(qId: Long, qv: Array[Double], qs: Double, row: Array[Double],
        pb: Block): Unit = {
      // k-th largest fast value (ties keep duplicates): one pass with a
      // tiny insertion buffer
      val top = new Array[Double](k)
      var filled = 0
      var j = 0
      while (j < row.length) {
        val v = row(j)
        if (!v.isNaN) {
          if (filled < k) {
            top(filled) = v; filled += 1
            if (filled == k) java.util.Arrays.sort(top)
          } else if (v > top(0)) {
            // replace the smallest, re-insert in order
            var p = 1
            while (p < k && top(p) < v) { top(p - 1) = top(p); p += 1 }
            top(p - 1) = v
          }
        }
        j += 1
      }
      if (filled == 0) return
      // fewer than k partners: nothing can be excluded, shortlist all
      val tau = if (filled < k) Double.NegativeInfinity else top(0) - slack
      // shortlist + exact rescore
      val cand = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      j = 0
      while (j < row.length) {
        val v = row(j)
        if (!v.isNaN && v >= tau) {
          val denom = qs * pb.sqrts(j)
          cand += ((exactSim(qv, pb.vecs(j), denom), pb.ids(j)))
        }
        j += 1
      }
      val sorted = cand.sortBy { case (s, id) => (-s, id) }
      var r = 0
      val lim = math.min(k, sorted.length)
      while (r < lim) {
        val row2 = new GenericInternalRow(3)
        row2.update(0, qId); row2.update(1, sorted(r)._2); row2.update(2, sorted(r)._1)
        out += row2
        r += 1
      }
    }

    i = 0
    while (i < a.n) { emitSide(a.ids(i), a.vecs(i), a.sqrts(i), fs(i), b); i += 1 }
    if (!diag) {
      val colBuf = new Array[Double](a.n)
      var jj = 0
      while (jj < b.n) {
        var ii = 0
        while (ii < a.n) { colBuf(ii) = fs(ii)(jj); ii += 1 }
        emitSide(b.ids(jj), b.vecs(jj), b.sqrts(jj), colBuf, a)
        jj += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** `pairs_above_fx(as, bs, diag)` as a Column; see
    * [[PairsAboveThresholdFx]].
    */
  def pairsAboveFx(as: Column, bs: Column, diag: Column, thr: Double): Column =
    ColumnBridge.column(PairsAboveThresholdFx(ColumnBridge.expression(as),
      ColumnBridge.expression(bs), ColumnBridge.expression(diag), thr))

  /** `block_topk_fx(as, bs, diag)` as a Column; see [[BlockTopKPairsFx]]. */
  def blockTopKFx(as: Column, bs: Column, diag: Column, k: Int): Column =
    ColumnBridge.column(BlockTopKPairsFx(ColumnBridge.expression(as),
      ColumnBridge.expression(bs), ColumnBridge.expression(diag), k))
}

/** Threshold-mode block-pair scorer — see [[BlockPairsFx]]. Children:
  * the two grouped sides (array<struct<id, v, n2, aux>>) and the
  * diagonal flag (lo == hi). Returns every unordered pair of the tile
  * with exact cosine >= `thr` as (a_id, b_id, sim, a_aux, b_aux),
  * a_id < b_id, sim bit-identical to the composed decomposed-cosine
  * form.
  */
case class PairsAboveThresholdFx(as: Expression, bs: Expression,
    diag: Expression, thr: Double) extends TernaryExpression {

  require(thr > 0.0, s"threshold must be positive (screen margin contract): $thr")

  override def first: Expression = as
  override def second: Expression = bs
  override def third: Expression = diag

  override def checkInputDataTypes(): TypeCheckResult = {
    val okSides = Seq(as, bs).forall(_.dataType match {
      case ArrayType(s: StructType, _) if s.length == 4 =>
        s(0).dataType == LongType &&
          s(1).dataType.isInstanceOf[ArrayType] &&
          s(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
          s(2).dataType == DoubleType && s(3).dataType == DoubleType
      case _ => false
    })
    if (okSides && diag.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pairs_above_fx requires (array<struct<long, array<double>, double, double>> x2, boolean), " +
        s"got ${as.dataType.simpleString} / ${bs.dataType.simpleString} / ${diag.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false),
    StructField("a_aux", DoubleType, nullable = false),
    StructField("b_aux", DoubleType, nullable = false))), containsNull = false)

  override def nullSafeEval(a: Any, b: Any, d: Any): Any =
    BlockPairsFx.pairsAbove(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      d.asInstanceOf[Boolean], thr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pairsAboveFx", this, classOf[PairsAboveThresholdFx].getName)
    nullSafeCodeGen(ctx, ev, (a, b, d) => s"${ev.value} = $self.score($a, $b, $d);")
  }

  /** Codegen entry (matches nullSafeEval). */
  def score(a: ArrayData, b: ArrayData, d: Boolean): ArrayData =
    BlockPairsFx.pairsAbove(a, b, d, thr)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PairsAboveThresholdFx =
    copy(as = newFirst, bs = newSecond, diag = newThird)

  override def prettyName: String = "pairs_above_fx"
}

/** Top-k-mode block-pair scorer — see [[BlockPairsFx]]. Same children
  * as [[PairsAboveThresholdFx]]; returns per-side tile-local top-k
  * directed candidates (q_id, n_id, sim), sims exact.
  */
case class BlockTopKPairsFx(as: Expression, bs: Expression,
    diag: Expression, k: Int) extends TernaryExpression {

  require(k >= 1, s"k must be positive: $k")

  override def first: Expression = as
  override def second: Expression = bs
  override def third: Expression = diag

  override def checkInputDataTypes(): TypeCheckResult = {
    val okSides = Seq(as, bs).forall(_.dataType match {
      case ArrayType(s: StructType, _) if s.length == 4 =>
        s(0).dataType == LongType &&
          s(1).dataType.isInstanceOf[ArrayType] &&
          s(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
          s(2).dataType == DoubleType && s(3).dataType == DoubleType
      case _ => false
    })
    if (okSides && diag.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"block_topk_fx requires (array<struct<long, array<double>, double, double>> x2, boolean), " +
        s"got ${as.dataType.simpleString} / ${bs.dataType.simpleString} / ${diag.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q_id", LongType, nullable = false),
    StructField("n_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)

  override def nullSafeEval(a: Any, b: Any, d: Any): Any =
    BlockPairsFx.topKPairs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      d.asInstanceOf[Boolean], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("blockTopKFx", this, classOf[BlockTopKPairsFx].getName)
    nullSafeCodeGen(ctx, ev, (a, b, d) => s"${ev.value} = $self.score($a, $b, $d);")
  }

  /** Codegen entry (matches nullSafeEval). */
  def score(a: ArrayData, b: ArrayData, d: Boolean): ArrayData =
    BlockPairsFx.topKPairs(a, b, d, k)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BlockTopKPairsFx =
    copy(as = newFirst, bs = newSecond, diag = newThird)

  override def prettyName: String = "block_topk_fx"
}
