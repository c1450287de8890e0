package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MultimodalOpsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("decode stub is deterministic and in-range") {
    val payload = "hello multimodal".getBytes("UTF-8")
    val a = MultimodalOps.Decode.features(payload)
    val b = MultimodalOps.Decode.features(payload)
    a shouldBe b
    val (len, w, h, fmt) = a
    assert(len == payload.length)
    assert(w >= 1 && w <= 640)
    assert(h >= 1 && h <= 480)
    assert(Set("png", "jpg", "webp").contains(fmt))
  }

  test("d17 resize fits the 256 box, only downscales, and agrees with d8's decoded dims") {
    val out = MultimodalOps.d17Resize(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val w = r.getAs[Long]("width"); val h = r.getAs[Long]("height")
      val ow = r.getAs[Long]("out_w"); val oh = r.getAs[Long]("out_h")
      assert(ow >= 1 && oh >= 1 && ow <= math.max(w, 256L) && oh <= math.max(h, 256L))
      if (math.max(w, h) <= 256) { assert(ow == w && oh == h) } // never upscale
      else {
        assert(math.max(ow, oh) == 256, s"long edge must hit the box: $w x $h -> $ow x $oh")
        // floor-scaled short edge: exact integer form of (short * 256 / long)
        if (w >= h) assert(oh == math.max(1L, h * 256 / w)) else assert(ow == math.max(1L, w * 256 / h))
      }
      assert(r.getAs[String]("thumb_md5").length == 32)
    }
    // dims must agree with d8's decode for the same payloads
    val d8dims = MultimodalOps.d8MultimodalDecode(spark, sf001).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("width"), r.getAs[Long]("height"))).toMap
    out.foreach { r =>
      d8dims.get(r.getAs[Long]("doc_id")).foreach { case (w, h) =>
        assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h)
      }
    }
  }

  test("boxAverage golden pixels: uniform and non-uniform box decompositions are exact") {
    // 4x4 ramp raster, 2x2 target: each output averages a 2x2 box
    //   0  1  2  3
    //   4  5  6  7      -> [(0+1+4+5)/4, (2+3+6+7)/4,
    //   8  9 10 11          (8+9+12+13)/4, (10+11+14+15)/4]
    //  12 13 14 15
    val ramp4 = MultimodalOps.boxAverage((x, y) => y * 4 + x, 4, 4, 2, 2)
    ramp4.toSeq shouldBe Seq(2, 4, 10, 12)
    // 5-wide source into 2: floor decomposition gives boxes [0,2) and
    // [2,5) — unequal counts, each averaged over its OWN count
    //   row: 10 20 30 40 50 -> [(10+20)/2, (30+40+50)/3] = [15, 40]
    val row5 = MultimodalOps.boxAverage((x, _) => (x + 1) * 10, 5, 1, 2, 1)
    row5.toSeq shouldBe Seq(15, 40)
    // floor of the average, not rounding: (0+1)/2 = 0
    MultimodalOps.boxAverage((x, _) => x, 2, 1, 1, 1).toSeq shouldBe Seq(0)
    // identity when target == source
    MultimodalOps.boxAverage((x, y) => y * 3 + x, 3, 2, 3, 2).toSeq shouldBe (0 until 6)
  }

  test("d17 oracle precondition: the corpus is ASCII, so DuckDB char slicing equals byte indexing") {
    // the oracle replays the byte-raster resample by ord(substr(text, ...));
    // that only equals the kernel's payload-byte indexing when every char
    // is single-byte — assert it so a future non-ASCII corpus fails HERE,
    // not as an opaque hash mismatch
    import org.apache.spark.sql.functions.col
    val nonAscii = graft.Tables.documents(spark, sf001)
      .filter(!col("text").rlike("^[\\x00-\\x7f]*$")).count()
    assert(nonAscii == 0L, s"$nonAscii documents contain non-ASCII text")
  }

  test("d8 pipeline preserves cardinality of the doc-embedding join and carries metadata") {
    val out = MultimodalOps.d8MultimodalDecode(spark, sf001)
    val docs = graft.Tables.documents(spark, sf001)
    val embs = graft.Tables.embeddings(spark, sf001)
    val joined = docs.join(embs, docs("doc_id") === embs("vec_id")).count()
    assert(out.count() == joined)
    val row = out.filter(out("doc_id") === 0).head()
    assert(row.getAs[Long]("emb_dim") == 64L)
    assert(row.getAs[Long]("byte_len") > 0)
  }
}
