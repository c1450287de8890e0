package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native nearest-centroid argmin kernels for the IVF/PQ family.
  *
  * The composed form these replace —
  * `array_min(transform(typedlit(centroids), c -> struct(aggregate(
  * zip_with(v, c._2, (a,b) -> (a-b)*(a-b)), 0.0, acc+x) AS d, c._1 AS
  * cid))).cid` per subspace — is correct but interpreted: every
  * higher-order array function is `CodegenFallback`, so one PQ encode
  * paid M×K per-centroid lambda dispatches plus intermediate
  * squared-diff arrays PER ROW (M=8 subspaces × K=16 centroids × 8 dims
  * ≈ 1k flops through boxed closures), and the d43 residual projection
  * re-evaluated once per subspace. These kernels run the whole argmin
  * grid as one fused loop nest per row with whole-stage codegen
  * (SURVEY.md §4 preference (b): custom `Expression` when built-in
  * composition is the bottleneck — the Md5Prefix60/CosineSimilarity
  * precedent applied to the r15-verdict d43 item).
  *
  * Floating-point/tie parity with the composed form (spec-pinned in
  * `PqArgminSpec`):
  *  - the squared distance accumulates sequentially in dimension order —
  *    identical to `aggregate(zip_with(...))`'s left fold and to the
  *    DuckDB oracle's replay;
  *  - centroids are iterated in ascending-cid order with a strict `<`
  *    update, so distance ties keep the SMALLEST cid — exactly
  *    `array_min`'s (d, cid) struct ordering (builders sort by cid, as
  *    `nearestCidLit` always did);
  *  - a null input vector yields null (`nullSafeEval`); vectors are
  *    dense fixed-dim embeddings, so per-element nulls don't occur.
  */
object PqArgmin {

  /** Flattened codebook constant shipped with the expression: per book
    * `cids(m)` (ascending) and `cents(m)` (K×subDim doubles,
    * centroid k at offset k*subDim). One reference object per
    * expression — the generated code calls [[nearest]] instead of
    * inlining a literal array the size of the codebook grid.
    */
  final class PqBooks(val cids: Array[Array[Int]], val cents: Array[Array[Double]],
      val subDim: Int) extends Serializable {
    require(cids.nonEmpty && cids.forall(_.nonEmpty), "empty codebook")

    /** Argmin cid of book `m` against `v[base .. base+subDim)`;
      * dimension loop bounded by the vector like the composed form's
      * `slice` (inputs are exact-dim in practice).
      */
    def nearest(v: ArrayData, base: Int, m: Int): Int = {
      val ids = cids(m); val cs = cents(m)
      val lim = math.min(subDim, v.numElements() - base)
      var bestD = Double.PositiveInfinity
      var best = ids(0)
      var first = true
      var k = 0
      while (k < ids.length) {
        var d = 0.0
        val off = k * subDim
        var j = 0
        while (j < lim) {
          val diff = v.getDouble(base + j) - cs(off + j)
          d += diff * diff
          j += 1
        }
        if (first || d < bestD) { bestD = d; best = ids(k); first = false }
        k += 1
      }
      best
    }

    /** All M codes of `v` (subvector m at offset m*subDim). */
    def codes(v: ArrayData): Array[Int] = {
      val out = new Array[Int](cids.length)
      var m = 0
      while (m < out.length) { out(m) = nearest(v, m * subDim, m); m += 1 }
      out
    }

    /** The M codes packed 4 bits apiece into one long (code m at bit 4m). */
    def packedKey(v: ArrayData): Long = {
      var key = 0L
      var m = 0
      while (m < cids.length) { key += nearest(v, m * subDim, m).toLong << (4 * m); m += 1 }
      key
    }

    override def toString: String =
      s"PqBooks(M=${cids.length},K=${cids.map(_.length).max},subDim=$subDim)"
  }

  private def flatten(books: Seq[Seq[(Int, Seq[Double])]], subDim: Int): PqBooks = {
    val sorted = books.map(_.sortBy(_._1))
    new PqBooks(
      sorted.map(_.map(_._1).toArray).toArray,
      sorted.map(_.flatMap { case (_, cv) =>
        // pad/trim defensively to subDim so offsets stay aligned; trained
        // centroids are exact-dim
        cv.padTo(subDim, 0.0).take(subDim)
      }.toArray).toArray,
      subDim)
  }

  private def arrayOfDoubleCheck(e: Expression, who: String): TypeCheckResult = e.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$who requires array<double>, got $t")
  }

  /** All M PQ codes of a vector: `array<int>` of length M. */
  case class PqCodes(child: Expression, books: PqBooks) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = arrayOfDoubleCheck(child, "pq_codes")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    override def nullSafeEval(input: Any): Any =
      UnsafeArrayData.fromPrimitiveArray(books.codes(input.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqBooks", books, classOf[PqBooks].getName)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
          s".fromPrimitiveArray($ref.codes($v));")
    }

    override protected def withNewChildInternal(newChild: Expression): PqCodes =
      copy(child = newChild)
  }

  /** The M PQ codes packed 4 bits apiece into one long (the s15 gate
    * column) — identical to the sum of `cast(code_m as long) << 4m`.
    */
  case class PqPackedCodeKey(child: Expression, books: PqBooks) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = arrayOfDoubleCheck(child, "pq_code_key")
    override def dataType: DataType = LongType

    override def nullSafeEval(input: Any): Any =
      books.packedKey(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqBooks", books, classOf[PqBooks].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.packedKey($v);")
    }

    override protected def withNewChildInternal(newChild: Expression): PqPackedCodeKey =
      copy(child = newChild)
  }

  /** Single-book argmin over a full vector (cell assignment: base 0,
    * book 0, subDim = vector dim).
    */
  case class NearestCellId(child: Expression, books: PqBooks) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = arrayOfDoubleCheck(child, "nearest_cell")
    override def dataType: DataType = IntegerType

    override def nullSafeEval(input: Any): Any =
      books.nearest(input.asInstanceOf[ArrayData], 0, 0)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqBooks", books, classOf[PqBooks].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.nearest($v, 0, 0);")
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCellId =
      copy(child = newChild)
  }

  /** Per-subspace argmin dispatched on a runtime subspace index — the PQ
    * training projection (`when(m === 0, argmin(book0, sv)) ...` chain
    * fused into one dispatch). `sv` is the already-sliced subvector
    * (base 0); an out-of-range `m` yields null like the when-chain's
    * missing otherwise.
    */
  case class PqSubCid(left: Expression, right: Expression, books: PqBooks)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure(s"pq_sub_cid m must be int, got ${left.dataType}")
      else arrayOfDoubleCheck(right, "pq_sub_cid")
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true

    override def nullSafeEval(mv: Any, sv: Any): Any = {
      val m = mv.asInstanceOf[Int]
      if (m < 0 || m >= books.cids.length) null
      else books.nearest(sv.asInstanceOf[ArrayData], 0, m)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqBooks", books, classOf[PqBooks].getName)
      nullSafeCodeGen(ctx, ev, (m, sv) =>
        s"""
           |if ($m >= 0 && $m < ${books.cids.length}) {
           |  ${ev.value} = $ref.nearest($sv, 0, $m);
           |} else {
           |  ${ev.isNull} = true;
           |}
         """.stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqSubCid =
      copy(left = newLeft, right = newRight)
  }

  /** Asymmetric-distance (ADC) score: `sum_m tabs[m][codes[m]]` — the
    * per-candidate inner loop of every PQ search join. Replaces the
    * composed `aggregate(zip_with(codes, tabs, (c, t) ->
    * element_at(t, c + 1)), 0.0, acc + x)` (CodegenFallback per joined
    * row: the corpus × probes stream is the PQ family's row-count
    * maximum, so this was the dominant interpreted term, not the encode).
    * Sum accumulates sequentially in subspace order, identical to the
    * fold. A code outside its table is unreachable from the encoder (ADC
    * tables are dense in cid); the kernel degrades to null there, where
    * the composed ANSI `element_at` would throw.
    */
  case class PqAdcScore(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<int>, array<array<double>>), got $l / $r")
    }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def nullSafeEval(codesAny: Any, tabsAny: Any): Any = {
      val codes = codesAny.asInstanceOf[ArrayData]
      val tabs = tabsAny.asInstanceOf[ArrayData]
      val m = math.min(codes.numElements(), tabs.numElements())
      var s = 0.0
      var i = 0
      while (i < m) {
        val t = tabs.getArray(i)
        val c = codes.getInt(i)
        if (c < 0 || c >= t.numElements()) return null
        s += t.getDouble(c)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (codes, tabs) => {
        val m = ctx.freshName("m"); val i = ctx.freshName("i")
        val s = ctx.freshName("s"); val t = ctx.freshName("t"); val c = ctx.freshName("c")
        s"""
           |int $m = java.lang.Math.min($codes.numElements(), $tabs.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $m; $i++) {
           |  org.apache.spark.sql.catalyst.util.ArrayData $t = $tabs.getArray($i);
           |  int $c = $codes.getInt($i);
           |  if ($c < 0 || $c >= $t.numElements()) { ${ev.isNull} = true; break; }
           |  $s += $t.getDouble($c);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdcScore =
      copy(left = newLeft, right = newRight)
  }

  /** Column builders. `books`/`centroids` are sorted by cid internally —
    * tie parity depends on it.
    */
  def pqCodes(books: Seq[Seq[(Int, Seq[Double])]], subDim: Int, v: Column): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(v), flatten(books, subDim)))

  def packedCodeKey(books: Seq[Seq[(Int, Seq[Double])]], subDim: Int, v: Column): Column =
    ColumnBridge.column(PqPackedCodeKey(ColumnBridge.expression(v), flatten(books, subDim)))

  def nearestCell(centroids: Seq[(Int, Seq[Double])], v: Column): Column = {
    val dim = centroids.head._2.length
    ColumnBridge.column(NearestCellId(ColumnBridge.expression(v), flatten(Seq(centroids), dim)))
  }

  def subCid(books: Seq[Seq[(Int, Seq[Double])]], subDim: Int, m: Column, sv: Column): Column =
    ColumnBridge.column(PqSubCid(
      ColumnBridge.expression(m), ColumnBridge.expression(sv), flatten(books, subDim)))

  def adcScore(codes: Column, tabs: Column): Column =
    ColumnBridge.column(PqAdcScore(
      ColumnBridge.expression(codes), ColumnBridge.expression(tabs)))
}
