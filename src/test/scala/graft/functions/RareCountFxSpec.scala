package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the fused rare-token counter ([[RareCountFx]]) against the
  * composed form it replaced, token for token: the 60-bit md5-prefix
  * hash, the three-row Count-Min minimum over disjoint 12-bit slices
  * (`counters[j*width + ((h >> bits*j) mod width)]`), the
  * `est * rareDen < total` strict rarity predicate, and multiplicity
  * counting — through the interpreted eval (in-memory replay) and a
  * real Spark projection (codegen path). The geometry here is the gate
  * geometry (width 4096, depth 3) plus a small one that forces
  * collisions.
  */
class RareCountFxSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ref(ws: Seq[String], cms: Array[Long], total: Long,
      rareDen: Long, width: Int, depth: Int): Long = {
    val bits = java.lang.Integer.numberOfTrailingZeros(width)
    ws.count { w =>
      val h = md5Prefix60(w)
      val est = (0 until depth)
        .map(j => cms(j * width + ((h >>> (bits * j)) % width).toInt)).min
      est * rareDen < total
    }.toLong
  }

  private def kernel(ws: Seq[String], cms: Array[Long], total: Long,
      rareDen: Long, width: Int, depth: Int): Long =
    RareCountFx(org.apache.spark.sql.catalyst.expressions.Literal.create(
      ws.toArray, ArrayType(StringType, containsNull = false)),
      cms, total, rareDen, width, depth).eval(null).asInstanceOf[Long]

  test("kernel == composed hash/probe/count reference (eval path, colliding geometry)") {
    val W = 16; val D = 3
    val gen = for {
      n <- Gen.choose(0, 120)
      ws <- Gen.listOfN(n, Gen.oneOf(
        Gen.alphaLowerStr.map(_.take(6)), Gen.oneOf("the", "of", "zz", "")))
      cms <- Gen.listOfN(W * D, Gen.choose(0L, 1000L)).map(_.toArray)
      total <- Gen.choose(0L, 200000L)
    } yield (ws, cms, total)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(gen) { case (ws, cms, total) =>
        kernel(ws, cms, total, 256L, W, D) == ref(ws, cms, total, 256L, W, D)
      })
    assert(res.passed, res.status.toString)
  }

  test("kernel through a Spark projection (codegen path) at the gate geometry") {
    val W = 4096; val D = 3
    val cms = Array.tabulate(W * D)(i => (i.toLong * 2654435761L) % 5000L)
    val total = 900000L
    val docs = Seq(
      Seq("alpha", "beta", "gamma", "alpha", "alpha"),
      Seq("the"),
      Seq.empty[String],
      (1 to 200).map(i => s"tok$i"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs.zipWithIndex.map { case (ws, i) =>
        org.apache.spark.sql.Row(i.toLong, ws)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", LongType),
        org.apache.spark.sql.types.StructField("ws", ArrayType(StringType)))))
    val got = df.select(col("id"),
        RareCountFx.rareCountFx(col("ws"), cms, total, 256L, W, D).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.zipWithIndex.foreach { case (ws, i) =>
      got(i.toLong) shouldBe ref(ws, cms, total, 256L, W, D)
    }
  }

  test("multiplicity counts every occurrence; strictness rejects the boundary") {
    val W = 16; val D = 1
    // single-row sketch: bucket of "x" = h mod 16; make its count 10
    val h = (md5Prefix60("x") % W).toInt
    val cms = Array.fill(W)(1000000L)
    cms(h) = 10L
    // est*256 = 2560: total 2561 -> rare; total 2560 (equal) -> NOT rare
    kernel(Seq("x", "x", "x"), cms, 2561L, 256L, W, D) shouldBe 3L
    kernel(Seq("x", "x", "x"), cms, 2560L, 256L, W, D) shouldBe 0L
  }
}
