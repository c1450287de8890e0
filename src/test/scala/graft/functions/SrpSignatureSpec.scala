package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SrpSignatureSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Bands = 8
  private val Bits = 16
  private val Dim = 64
  private val Seed = 0x6ea1f00dL

  private def embs = graft.Tables.embeddings(spark, sf001)
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

  /** Driver-side reference: same hyperplanes (via the exposed [[SrpSignature.planes]]),
    * plain Scala loop — pins the kernel's codegen path bit for bit.
    */
  private def reference(v: Seq[Double]): Seq[Long] = {
    val planes = SrpSignature.planes(Bands * Bits, Dim, Seed)
    val n = math.min(v.length, Dim)
    (0 until Bands).map { b =>
      (0 until Bits).foldLeft(0L) { (key, r) =>
        val j = b * Bits + r
        var dot = 0.0
        (0 until n).foreach(d => dot += v(d) * planes(j * Dim + d))
        (key << 1) | (if (dot >= 0.0) 1L else 0L)
      }
    }
  }

  test("kernel band keys match the driver-side reference bit for bit") {
    val rows = embs.select(col("v"),
      SrpSignature.srpSignature(col("v"), Bands, Bits, Dim, Seed).as("keys"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      r.getSeq[Long](1) shouldBe reference(v)
    }
  }

  test("signatures are scale-invariant and identical vectors always collide") {
    val rows = embs.limit(20).select(
      SrpSignature.srpSignature(col("v"), Bands, Bits, Dim, Seed).as("orig"),
      SrpSignature.srpSignature(transform(col("v"), x => x * lit(7.5)), Bands, Bits, Dim, Seed).as("scaled"))
      .collect()
    rows.foreach(r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1))
  }

  test("null vector propagates null; wrong input type fails analysis") {
    val r = embs.select(
      SrpSignature.srpSignature(lit(null).cast("array<double>"), Bands, Bits, Dim, Seed)).head()
    assert(r.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      embs.select(SrpSignature.srpSignature(col("vec_id"), Bands, Bits, Dim, Seed)).head()
    }
  }
}
