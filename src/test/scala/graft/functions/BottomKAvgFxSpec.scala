package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the bottom-k selection kernel ([[BottomKAvgFx]]) against the
  * composed form it replaced: `sorted.take(k).sum` averaged by the
  * truncating Euclidean split. Covers duplicates (multiset selection),
  * k = 1 clamps, arrays at and under the insertion-sort window, the
  * quickselect recursion path, and the empty-array zero convention —
  * both through the interpreted eval (in-memory replay) and through a
  * real Spark projection (codegen path).
  */
class BottomKAvgFxSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Denom = 5

  private def ref(xs: Seq[Long]): Long = {
    if (xs.isEmpty) return 0L
    val k = math.max(1L, xs.length / Denom)
    val s = xs.sorted.take(k.toInt).sum
    s / k * 1048576L + s % k * 1048576L / k
  }

  private def kernel(xs: Seq[Long]): Long =
    BottomKAvgFx(org.apache.spark.sql.catalyst.expressions.Literal.create(
      xs.toArray, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false)), Denom)
      .eval(null).asInstanceOf[Long]

  test("kernel == sorted-take-k reference on random nonnegative term arrays") {
    // the Min-K terms are nonnegative fixed-point values under 2^28
    val gen = for {
      n <- Gen.frequency(1 -> Gen.choose(0, 3), 3 -> Gen.choose(4, 30),
        3 -> Gen.choose(31, 400))
      xs <- Gen.listOfN(n, Gen.choose(0L, 1L << 28))
    } yield xs
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(gen) { xs => kernel(xs) == ref(xs) })
    assert(res.passed, res.status.toString)
  }

  test("duplicates select by multiplicity; ties at the k-boundary are value-exact") {
    // 100 copies of 7 and 100 copies of 3: k = 40, all forty selected
    // terms are 3s regardless of which positional copies quickselect kept
    val xs = Seq.fill(100)(7L) ++ Seq.fill(100)(3L)
    kernel(xs) shouldBe ref(xs)
    ref(xs) shouldBe 3L * 1048576L
  }

  test("short arrays clamp k to 1 (the minimum term)") {
    kernel(Seq(9L, 2L, 5L)) shouldBe 2L * 1048576L
    kernel(Seq(42L)) shouldBe 42L * 1048576L
  }

  test("empty array returns 0 (the old fold's empty-slice value)") {
    kernel(Seq.empty) shouldBe 0L
  }

  test("DoubleOrderBits: signed-long order of the mapped bits == double order (ADC ranking exactness)") {
    val gen = Gen.oneOf(
      Gen.choose(-1e12, 1e12),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, Double.MaxValue,
        Double.PositiveInfinity, Double.NegativeInfinity))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(gen, gen) { (a, b) =>
        val (ba, bb) = (DoubleOrderBits.bitsOf(a), DoubleOrderBits.bitsOf(b))
        (a < b) == (ba < bb) || (a == b) // -0.0 == 0.0 maps to two adjacent bit values
      })
    assert(res.passed, res.status.toString)
  }

  test("codegen path: Spark projection matches the interpreted eval") {
    import spark.implicits._
    val rows = Seq(
      (1L, (1L to 100L).reverse.toArray),
      (2L, Array.fill(64)(5L)),
      (3L, Array(8L, 1L, 1L, 9L, 1L, 2L, 2L, 3L, 0L, 7L, 6L, 6L)),
      (4L, Array.empty[Long]))
    val got = rows.toDF("id", "ts")
      .select(col("id"), BottomKAvgFx.bottomKAvgFx(col("ts"), Denom).as("fx"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, ts) => got(id) shouldBe ref(ts.toSeq) }
  }
}
