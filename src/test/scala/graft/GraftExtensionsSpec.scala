package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The SQL function surface. The shared spec session is built with
  * `spark.sql.extensions=graft.GraftExtensions` (SparkSpec), so these
  * tests exercise the REAL deployment path: class-name loading +
  * injectFunction at session build, then resolution of SQL calls through
  * the injected builders.
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def withViews[T](body: => T): T = {
    graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .createOrReplaceTempView("emb")
    graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).createOrReplaceTempView("docs")
    body
  }

  test("cosine_sim is SQL-callable and matches the Column API bit for bit") {
    withViews {
      val viaSql = spark.sql(
        """SELECT a.vec_id a_id, b.vec_id b_id, cosine_sim(a.v, b.v) sim
          |FROM emb a JOIN emb b ON a.vec_id < b.vec_id""".stripMargin)
      val e = spark.table("emb")
      val viaCol = e.select(col("vec_id").as("a_id"), col("v").as("va"))
        .crossJoin(e.select(col("vec_id").as("b_id"), col("v").as("vb")))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          graft.functions.CosineSimilarity.cosineSim(col("va"), col("vb")).as("sim"))
      viaSql.exceptAll(viaCol).count() shouldBe 0L
      viaCol.exceptAll(viaSql).count() shouldBe 0L
    }
  }

  test("parameterized kernels take SQL literals: srp_signature, simhash_bits, rolling_hash, minhash_signature") {
    withViews {
      val viaSql = spark.sql(
        """SELECT vec_id, srp_signature(v, 8, 16, 64, 1856106509) keys FROM emb""")
      val viaCol = spark.table("emb").select(col("vec_id"),
        graft.functions.SrpSignature.srpSignature(col("v"), 8, 16, 64, 0x6ea1f00dL).as("keys"))
      viaSql.exceptAll(viaCol).count() shouldBe 0L

      val rh = spark.sql(
        """SELECT doc_id, rolling_hash(text) h1, rolling_hash(text, 31, 1000000007) h3 FROM docs""")
        .collect()
      rh.foreach(r => r.getLong(1) shouldBe r.getLong(2))

      // array(...) of constants folds to an array literal for the seeds
      val mh = spark.sql(
        """SELECT minhash_signature(array(CAST(xxhash64(text) % 1000000007 AS BIGINT)),
          |array(3L, 5L), array(7L, 11L), 1000000007L) mh FROM docs LIMIT 5""".stripMargin)
        .collect()
      mh.foreach(r => r.getSeq[Long](0).length shouldBe 2)

      val sh = spark.sql(
        """SELECT doc_id, simhash_bits(array(xxhash64(text)), 16) fp FROM docs LIMIT 5""")
        .collect()
      sh.foreach(r => assert(r.getLong(1) >= 0L && r.getLong(1) < (1L << 16)))

      val ww = spark.sql(
        """SELECT doc_id, word_window_md5(lower(trim(text)), 8) ws FROM docs
          |WHERE size(split(lower(trim(text)), ' ')) >= 8""".stripMargin)
      val wwCol = spark.table("docs")
        .select(col("doc_id"), lower(trim(col("text"))).as("t"))
        .filter(expr("size(split(t, ' ')) >= 8"))
        .select(col("doc_id"),
          graft.functions.WordWindowMd5.wordWindowMd5(col("t"), 8).as("ws"))
      // symmetric: either direction alone would pass on a strict subset
      ww.exceptAll(wwCol).count() shouldBe 0L
      wwCol.exceptAll(ww).count() shouldBe 0L
    }
  }

  test("winnow_md5 and bitmap_or_agg are SQL-callable and match the Column API") {
    withViews {
      val viaSql = spark.sql(
        """SELECT doc_id, s.pos, s.gh
          |FROM docs LATERAL VIEW explode(winnow_md5(lower(trim(text)), 8, 4)) AS s""".stripMargin)
      val viaCol = graft.ops.CorpusOps.d52Winnow(spark, sf001)
      viaSql.exceptAll(viaCol).count() shouldBe 0L
      viaCol.exceptAll(viaSql).count() shouldBe 0L

      val bm = spark.sql(
        "SELECT bitmap_or_agg(p, 128) FROM (VALUES (0L), (64L), (64L), (127L)) AS t(p)")
        .head().getSeq[Long](0)
      bm shouldBe Seq(1L, (1L << 0) | (1L << 63))
    }
  }

  test("ngram_jaccard of a string with itself is 1.0 via SQL") {
    withViews {
      spark.sql("SELECT ngram_jaccard(text, text, 8) j FROM docs WHERE length(text) >= 8 LIMIT 5")
        .collect().foreach(r => r.getDouble(0) shouldBe 1.0)
    }
  }

  test("non-literal static parameters are rejected with a clear error") {
    withViews {
      val e = intercept[Exception] {
        spark.sql("SELECT srp_signature(v, CAST(vec_id AS INT), 16, 64, 1) FROM emb").collect()
      }
      e.getMessage should include("bands must be an integer literal")
    }
  }
}
