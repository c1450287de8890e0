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
