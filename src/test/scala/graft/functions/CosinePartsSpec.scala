package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the DECOMPOSED cosine — `dot_product` per pair plus carried
  * `sum_squares` norms, finished as the zero-guarded
  * `dot / (sqrt(na) * sqrt(nb))` — BIT-identical (raw IEEE bits, not
  * approximate) to the fused [[CosineSimilarity]] kernel on
  * equal-length arrays: every accumulator runs the same FP ops in the
  * same index order, and the finish replicates the kernel's exact
  * expression. This is what lets the quadratic pair stages
  * (d9/d46/d55/d58) pay one multiply-accumulate per element instead of
  * three without moving a single output bit. Equal lengths are part of
  * the contract (mismatched lengths prefix-bound the fused kernel's
  * norms but not the carried ones) — embeddings are fixed-dim at every
  * call site.
  */
class CosinePartsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def lit64(xs: Seq[Double]) =
    org.apache.spark.sql.catalyst.expressions.Literal.create(
      xs.toArray, ArrayType(DoubleType, containsNull = false))

  private def fused(a: Seq[Double], b: Seq[Double]): Double =
    CosineSimilarity(lit64(a), lit64(b)).eval(null).asInstanceOf[Double]

  private def decomposed(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = DotProduct(lit64(a), lit64(b)).eval(null).asInstanceOf[Double]
    val na = SumSquares(lit64(a)).eval(null).asInstanceOf[Double]
    val nb = SumSquares(lit64(b)).eval(null).asInstanceOf[Double]
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  private val genVec = for {
    n <- Gen.choose(0, 64)
    xs <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(-10.0, 10.0), Gen.const(0.0), Gen.choose(-1e-300, 1e-300)))
  } yield xs

  test("decomposed == fused kernel, raw IEEE bits (eval path)") {
    val gen = for { a <- genVec; b <- Gen.listOfN(a.length, Gen.choose(-10.0, 10.0)) } yield (a, b)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(gen) { case (a, b) =>
        java.lang.Double.doubleToRawLongBits(fused(a, b)) ==
          java.lang.Double.doubleToRawLongBits(decomposed(a, b))
      })
    assert(res.passed, res.status.toString)
  }

  test("zero vectors and empties hit the same zero-denominator guard") {
    fused(Seq(0.0, 0.0), Seq(1.0, 2.0)) shouldBe 0.0
    decomposed(Seq(0.0, 0.0), Seq(1.0, 2.0)) shouldBe 0.0
    fused(Seq.empty, Seq.empty) shouldBe 0.0
    decomposed(Seq.empty, Seq.empty) shouldBe 0.0
  }

  test("decomposed == fused through a Spark projection (codegen path)") {
    val vecs = Seq(
      (1L, Seq(1.0, 2.0, 3.0, -4.0), Seq(0.5, -0.25, 8.0, 1.0)),
      (2L, Seq(1e-8, 2e8, -3.5, 0.0), Seq(7.0, 7.0, 7.0, 7.0)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0, 1.0)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map { case (i, a, b) =>
        org.apache.spark.sql.Row(i, a, b)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", LongType),
        org.apache.spark.sql.types.StructField("a", ArrayType(DoubleType)),
        org.apache.spark.sql.types.StructField("b", ArrayType(DoubleType)))))
    val denom = sqrt(SumSquares.sumSquares(col("a"))) * sqrt(SumSquares.sumSquares(col("b")))
    val rows = df.select(col("id"),
        CosineSimilarity.cosineSim(col("a"), col("b")).as("fused"),
        when(denom === 0.0, lit(0.0))
          .otherwise(DotProduct.dotProduct(col("a"), col("b")) / denom).as("dec"))
      .collect()
    rows.foreach { r =>
      java.lang.Double.doubleToRawLongBits(r.getDouble(1)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(2))
    }
  }
}
