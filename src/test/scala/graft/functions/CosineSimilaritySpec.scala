package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CosineSimilaritySpec extends AnyFunSuite with SparkSpec with Matchers {

  private def embs = graft.Tables.embeddings(spark, sf001)
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

  test("native kernel is bit-identical to the composed higher-order form") {
    val a = embs.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = embs.select(col("vec_id").as("b_id"), col("v").as("vb"))
    def hof(x: String, y: String) =
      aggregate(zip_with(col(x), col(y), (p, q) => p * q), lit(0.0), (acc, p) => acc + p) /
        (sqrt(aggregate(zip_with(col(x), col(x), (p, q) => p * q), lit(0.0), (acc, p) => acc + p)) *
         sqrt(aggregate(zip_with(col(y), col(y), (p, q) => p * q), lit(0.0), (acc, p) => acc + p)))
    val pairs = a.crossJoin(b).filter(col("a_id") < col("b_id")).limit(2000)
      .select(
        CosineSimilarity.cosineSim(col("va"), col("vb")).as("native"),
        hof("va", "vb").as("composed"))
    val mismatches = pairs.filter(col("native") =!= col("composed")).count()
    mismatches shouldBe 0L
  }

  test("self-similarity is 1.0 and null arrays propagate null") {
    val row = embs.select(
      CosineSimilarity.cosineSim(col("v"), col("v")).as("self"),
      CosineSimilarity.cosineSim(lit(null).cast("array<double>"), col("v")).as("n"))
      .head()
    row.getDouble(0) shouldBe 1.0 +- 1e-12
    assert(row.isNullAt(1))
  }

  test("rejects non-double-array inputs at analysis time") {
    intercept[AnalysisException] {
      embs.select(CosineSimilarity.cosineSim(col("vec_id"), col("v"))).head()
    }
  }
}
