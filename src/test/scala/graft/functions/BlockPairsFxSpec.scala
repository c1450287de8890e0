package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the block-pair kernels ([[BlockPairsFx]]) against a plain-Scala
  * reference that replays the EXACT composed semantics they replaced:
  * sequential in-order dot fold, `sqrt(sumsq)·sqrt(sumsq)` denominator,
  * zero-denominator -> 0.0, threshold `>=`, top-k by (sim desc, id asc).
  * Similarities must match RAW IEEE BITS — the fast-dot screen and the
  * shortlist are allowed to change nothing observable.
  */
class BlockPairsFxSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = 8

  /** Deterministic corpus: random vectors + planted structure — a zero
    * vector (denominator guard), exact duplicates (sim ties at 1.0),
    * and perturbed twins (near-threshold pairs).
    */
  private def corpus(n: Int, seed: Long): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    val base = (0L until n.toLong).map { i =>
      i -> Array.fill(Dim)(rnd.nextDouble() * 2 - 1)
    }
    base.map {
      case (i, _) if i == 3L => i -> Array.fill(Dim)(0.0) // zero vector
      case (i, _) if i == 7L && n > 2 => i -> base(2)._2.clone() // exact dup of id 2
      case (i, v) if i == 11L => i -> v.map(x => x * 0.95 + 0.01) // soft twin
      case (i, v) => i -> v
    }
  }

  // ---- the composed reference, replayed in plain Scala ----------------

  private def exactDot(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) { d += a(i) * b(i); i += 1 }
    d
  }
  private def sumSq(a: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { d += a(i) * a(i); i += 1 }
    d
  }
  private def refSim(a: Array[Double], b: Array[Double]): Double = {
    val denom = math.sqrt(sumSq(a)) * math.sqrt(sumSq(b))
    if (denom == 0.0) 0.0 else exactDot(a, b) / denom
  }

  private def refPairs(c: Seq[(Long, Array[Double])], thr: Double): Map[(Long, Long), Long] =
    (for {
      (ia, va) <- c; (ib, vb) <- c if ia < ib
      s = refSim(va, vb) if s >= thr
    } yield (ia, ib) -> java.lang.Double.doubleToRawLongBits(s)).toMap

  private def refTopK(c: Seq[(Long, Array[Double])], k: Int): Map[(Long, Long), Long] =
    c.flatMap { case (q, qv) =>
      c.filter(_._1 != q)
        .map { case (n, nv) => (n, refSim(qv, nv)) }
        .sortBy { case (n, s) => (-s, n) }
        .take(k)
        .map { case (n, s) => (q, n) -> java.lang.Double.doubleToRawLongBits(s) }
    }.toMap

  // ---- the kernel pipelines (the d9/d58 shapes, small B) --------------

  private def corpusDf(c: Seq[(Long, Array[Double])]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(c.map { case (i, v) => Row(i, v.toSeq) }, 4),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("v", ArrayType(DoubleType, containsNull = false)))))

  private def tiles(c: Seq[(Long, Array[Double])], blockSize: Long): (DataFrame, Long) = {
    val e = corpusDf(c)
      .withColumn("blk", floor(col("vec_id") / blockSize))
      .withColumn("n2", SumSquares.sumSquares(col("v")))
    val nBlocks = e.agg(coalesce(max(col("blk")), lit(0L))).head().getLong(0) + 1
    val item = struct(col("vec_id").as("id"), col("v"), col("n2"),
      (col("vec_id") * 10).cast("double").as("aux")) // distinguishable aux payload
    (e.select(col("blk"), item.as("it"))
      .groupBy(col("blk")).agg(collect_list(col("it")).as("items")), nBlocks)
  }

  private def kernelPairs(c: Seq[(Long, Array[Double])], thr: Double,
      blockSize: Long): Seq[Row] = {
    val (blocks, nBlocks) = tiles(c, blockSize)
    val lo = blocks.select(col("blk").as("lo"),
      explode(sequence(col("blk"), lit(nBlocks - 1))).as("hi"), col("items").as("as_"))
    val hi = blocks.select(explode(sequence(lit(0L), col("blk"))).as("lo"),
      col("blk").as("hi"), col("items").as("bs_"))
    lo.join(hi, Seq("lo", "hi"))
      .select(explode(BlockPairsFx.pairsAboveFx(
        col("as_"), col("bs_"), col("lo") === col("hi"), thr)).as("p"))
      .select(col("p.a_id"), col("p.b_id"), col("p.sim"), col("p.a_aux"), col("p.b_aux"))
      .collect().toSeq
  }

  private def kernelTopK(c: Seq[(Long, Array[Double])], k: Int,
      blockSize: Long): Map[(Long, Long), Long] = {
    val (blocks, nBlocks) = tiles(c, blockSize)
    val lo = blocks.select(col("blk").as("lo"),
      explode(sequence(col("blk"), lit(nBlocks - 1))).as("hi"), col("items").as("as_"))
    val hi = blocks.select(explode(sequence(lit(0L), col("blk"))).as("lo"),
      col("blk").as("hi"), col("items").as("bs_"))
    val directed = lo.join(hi, Seq("lo", "hi"))
      .select(explode(BlockPairsFx.blockTopKFx(
        col("as_"), col("bs_"), col("lo") === col("hi"), k)).as("p"))
      .select(col("p.q_id"), col("p.n_id"), col("p.sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    directed.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> java.lang.Double.doubleToRawLongBits(r.getDouble(2)))
      .toMap
  }

  private def asMap(rows: Seq[Row]): Map[(Long, Long), Long] =
    rows.map(r => (r.getLong(0), r.getLong(1)) ->
      java.lang.Double.doubleToRawLongBits(r.getDouble(2))).toMap

  // ---- pins ------------------------------------------------------------

  test("threshold mode == brute-force composed pairs, raw IEEE bits, at several thresholds") {
    val c = corpus(30, seed = 0xA11CE)
    for (thr <- Seq(0.9, 0.45, 0.38, 0.05); b <- Seq(4L, 7L, 64L)) {
      val got = kernelPairs(c, thr, b)
      withClue(s"thr=$thr blockSize=$b: ") {
        asMap(got) shouldBe refPairs(c, thr)
        // canonical orientation and the aux payload ride through
        got.foreach { r =>
          r.getLong(0) should be < r.getLong(1)
          r.getDouble(3) shouldBe r.getLong(0) * 10.0
          r.getDouble(4) shouldBe r.getLong(1) * 10.0
        }
      }
    }
  }

  test("threshold EXACTLY at an observed similarity keeps the >= boundary pair") {
    val c = corpus(20, seed = 0xBEEF)
    val sims = (for { (ia, va) <- c; (ib, vb) <- c if ia < ib } yield refSim(va, vb))
      .filter(s => s > 0.01 && s < 0.99).sorted
    val thr = sims(sims.length / 2) // a REAL pair value: >= must include it
    asMap(kernelPairs(c, thr, 8L)) shouldBe refPairs(c, thr)
  }

  test("top-k mode + window == brute-force top-k, raw IEEE bits (k=1,3,5; ties by id)") {
    val c = corpus(26, seed = 0xD00D)
    for (k <- Seq(1, 3, 5); b <- Seq(4L, 9L, 64L)) {
      withClue(s"k=$k blockSize=$b: ") {
        kernelTopK(c, k, b) shouldBe refTopK(c, k)
      }
    }
  }

  test("interpreted (non-codegen) path agrees with the codegen path") {
    val c = corpus(18, seed = 0xF00)
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key, "true")
    val codegen = asMap(kernelPairs(c, 0.2, 5L))
    val codegenK = kernelTopK(c, 2, 5L)
    try {
      spark.conf.set(key, "false")
      asMap(kernelPairs(c, 0.2, 5L)) shouldBe codegen
      kernelTopK(c, 2, 5L) shouldBe codegenK
    } finally spark.conf.set(key, prev)
    codegen shouldBe refPairs(c, 0.2)
    codegenK shouldBe refTopK(c, 2)
  }

  test("zero vectors hit the 0.0 convention: never above a positive threshold, sortable in top-k") {
    val c = corpus(12, seed = 0x0) // id 3 is the zero vector
    val pairs = asMap(kernelPairs(c, 0.01, 4L))
    pairs.keys.foreach { case (a, bId) => a should not be 3L; bId should not be 3L }
    // reference top-k already scores the zero vector's pairs as 0.0
    kernelTopK(c, 3, 4L) shouldBe refTopK(c, 3)
  }

  test("exact duplicates tie at sim == 1.0 and break by id in top-k") {
    val c = corpus(16, seed = 0x7E57) // ids 2 and 7 are identical vectors
    val top = kernelTopK(c, 1, 4L)
    top((2L, 7L)) shouldBe java.lang.Double.doubleToRawLongBits(
      refSim(c(2)._2, c(7)._2))
    kernelTopK(c, 1, 4L) shouldBe refTopK(c, 1)
  }
}
