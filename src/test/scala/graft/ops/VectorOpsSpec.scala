package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class VectorOpsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("d6 brute-force ANN: k results per query, ranked by similarity") {
    val rows = VectorOps.d6AnnBrute(spark, sf001).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("q_id"))
    byQuery.foreach { case (_, rs) =>
      assert(rs.length == 10)
      val ranked = rs.sortBy(_.getAs[Int]("rn"))
      val sims = ranked.map(_.getAs[Double]("sim"))
      sims.zip(sims.tail).foreach { case (hi, lo) => assert(hi >= lo) }
      sims.foreach(s => assert(s >= -1.0 && s <= 1.0 + 1e-9))
      // self is excluded
      ranked.foreach(r => assert(r.getAs[Long]("n_id") != r.getAs[Long]("q_id")))
    }
  }

  test("d9 blocked self-join finds exactly the brute-force all-pairs result") {
    val e = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
    val brute = a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        graft.functions.CosineSimilarity.cosineSim(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= 0.45)
      .select(col("a_id"), col("b_id"), round(col("sim"), 6).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = VectorOps.d9EmbedNeardup(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty, "fixture should contain at least one pair above threshold")
    blocked shouldBe brute
  }

  test("d9 emitted pairs and similarity BITS are invariant to the block edge") {
    // blocking is pure partitioning — which tile a pair is scored in —
    // so the data-sized edge (d9BlockEdge) must change nothing but the
    // plan's replication factor
    val e = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    def run(edge: Option[Long]): Set[(Long, Long, Long)] =
      VectorOps.d9EmbedNeardupOver(e, edge).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).toSet
    val sized = run(None)
    assert(sized.nonEmpty)
    run(Some(64L)) shouldBe sized
    run(Some(256L)) shouldBe sized
    run(Some(1000L)) shouldBe sized
  }

  test("d16 SRP-LSH finds exactly the brute-force pairs over the planted corpus") {
    // rebuild the planted corpus with the same arithmetic d16 uses
    val e = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val corpus = e.union(e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("v"), x => x * lit(0.99) + lit(0.001)).as("v")))
    val a = corpus.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = corpus.select(col("vec_id").as("b_id"), col("v").as("vb"))
    val brute = a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        graft.functions.CosineSimilarity.cosineSim(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= 0.9)
      .select(col("a_id"), col("b_id"), round(col("sim"), 6).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = VectorOps.d16SrpNeardup(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty, "planted twins must produce pairs above threshold")
    // above 0.9 only the planted (source, twin) pairs exist in this fixture
    brute.foreach { case (aId, bId, _) => assert(bId == aId + 10000L) }
    lsh shouldBe brute
  }

  test("kmeans assignment is the bit-exact argmin over the trained centroids") {
    val e = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val centroids = VectorOps.kmeansCentroids(e, k = 8, iters = 3)
    val assigned = VectorOps.assignToCentroids(e, centroids)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getInt(2)))
    assigned.length shouldBe e.count()

    // sequential-fold L2 in index order matches the zip_with/aggregate
    // accumulation bit for bit, and (dist, cid) tuple order matches the
    // min(struct(d, cid)) tie-break — so the argmin must agree EXACTLY
    assigned.foreach { case (id, v, cid) =>
      val best = centroids.map { case (c, cv) =>
        var d = 0.0
        v.indices.foreach(i => d += (v(i) - cv(i)) * (v(i) - cv(i)))
        (d, c)
      }.min
      assert(best._2 == cid, s"vec $id: expected argmin cell ${best._2}, got $cid")
    }
  }

  test("d13 kmeans-IVF neighbors share the query's trained cell and score exactly") {
    val e = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    // ONE training feeds both the expected cells and the probe under test:
    // independent retrains may differ by ulps in avg()'s aggregation order
    // (see kmeansCentroids doc), so cross-run cell identity is not assumed.
    // Sampled training (what d13 ships) — the full corpus is still
    // assigned, so every query/neighbor below went through the one
    // full-corpus assignment pass.
    val cellsDf = VectorOps.kmeansAssignSampled(e, k = 8, iters = 3, sampleMod = 4)
    val cells = cellsDf
      .collect().map(r => r.getLong(0) -> (r.getSeq[Double](1), r.getInt(2))).toMap
    val res = VectorOps.annIvfOverCells(cellsDf).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val q = r.getAs[Long]("q_id"); val n = r.getAs[Long]("n_id")
      assert(cells(n)._2 == cells(q)._2, "IVF must only probe the query's own cell")
      // similarity is the exact sequential-accumulation cosine
      val (qv, _) = cells(q); val (nv, _) = cells(n)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      qv.indices.foreach { i => dot += qv(i) * nv(i); na += qv(i) * qv(i); nb += nv(i) * nv(i) }
      val sim = BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.abs(sim - r.getAs[Double]("sim")) should be < 1e-9
    }
  }

  test("d7 IVF ANN probes only the query's cell and agrees with brute force on shared pairs") {
    import spark.implicits._
    val labels = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val ivf = VectorOps.d7AnnIvf(spark, sf001).collect()
    ivf.foreach { r =>
      assert(labels(r.getAs[Long]("n_id")) == labels(r.getAs[Long]("q_id")),
        "IVF must only return candidates from the query's own cell")
    }
    // where IVF and brute force return the same pair, the exact similarity agrees
    val brute = VectorOps.d6AnnBrute(spark, sf001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) -> r.getAs[Double]("sim")).toMap
    val shared = ivf.flatMap { r =>
      brute.get((r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
        .map(b => (b, r.getAs[Double]("sim")))
    }
    assert(shared.nonEmpty, "IVF should recover some true neighbors")
    shared.foreach { case (b, i) => assert(math.abs(b - i) < 1e-12) }
  }

  test("d21 kmedians-IVF probes within trained cells and covers every query") {
    val res = VectorOps.d21AnnIvfKmedians(spark, sf001).collect()
    // every query (vec_id < 20) must surface neighbors, and ranks are
    // dense 1..k' per query
    val byQ = res.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 20, s"expected 20 probed queries, got ${byQ.size}")
    byQ.foreach { case (q, rows) =>
      rows.map(_.getAs[Int]("rn")).sorted.toSeq shouldBe (1 to rows.length)
      rows.foreach(r => assert(r.getAs[Double]("sim") <= 1.0 + 1e-9, s"query $q"))
    }
  }

  test("d34 multi-probe IVF: neighbors come from the two probed cells; recall dominates single-probe") {
    val brute = VectorOps.d6AnnBrute(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = VectorOps.d7AnnIvf(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = VectorOps.d34AnnIvfProbes(spark, sf001).collect()
    val multiSet = multi.map(r => (r.getLong(0), r.getLong(1))).toSet

    // structure: per-query <= 10, rn ranks sim descending
    multi.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.length <= 10)
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $qid: sim not descending in rank order")
    }
    // every query answered
    multi.map(_.getLong(0)).distinct.length shouldBe 20
    // probing the 2 nearest cells must recall at least as many true
    // top-10 pairs as probing 1 cell — the point of the operator
    val recallMulti = (multiSet & brute).size
    val recallSingle = (single & brute).size
    assert(recallMulti >= recallSingle,
      s"multi-probe recall $recallMulti < single-probe $recallSingle")
  }

  test("d35 IVF-PQ: ADC candidates + exact rerank recall brute-force neighbors; deterministic") {
    val brute = VectorOps.d6AnnBrute(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = VectorOps.d35AnnIvfPq(spark, sf001).collect()
    val pqSet = pq.map(r => (r.getLong(0), r.getLong(1))).toSet

    // structure: every query answered with <= 10 ranked results, sims exact
    pq.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.length <= 10)
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $qid: sim not descending in rank order")
    }
    pq.map(_.getLong(0)).distinct.length shouldBe 20
    // the rerank is EXACT cosine, so any (q, n) pair shared with brute
    // force must carry the identical similarity
    val bruteSims = VectorOps.d6AnnBrute(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pq.foreach { r =>
      bruteSims.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(r.getDouble(2) == s, s"rerank sim diverged for ${(r.getLong(0), r.getLong(1))}")
      }
    }
    // recall floor: 16-code product quantization over 50 ADC candidates
    // recovers most of the true top-10 set on this corpus (measured 0.63
    // — honest for 4-bit-per-subspace codes on near-uniform vectors;
    // pinned conservatively so codebook ulps can't flake the build)
    val recall = (pqSet & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"ADC+rerank recall $recall below floor")
    // deterministic: a second run reproduces the result exactly
    val again = VectorOps.d35AnnIvfPq(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    again shouldBe pq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
  }

  test("d36 full IVF-PQ: candidates confined to probed cells, rerank exact, recall above floor") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val labels = e.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val full = VectorOps.d36AnnIvfPqFull(spark, sf001).collect()
    // structure + coverage
    full.map(_.getLong(0)).distinct.length shouldBe 20
    full.groupBy(_.getLong(0)).foreach { case (_, rows) => assert(rows.length <= 10) }
    // cell containment: every neighbor's label is one of at most 3 labels
    // per query (the probed cells)
    full.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val cells = rows.map(r => labels(r.getLong(1))).distinct
      assert(cells.length <= 3, s"query $qid drew neighbors from ${cells.length} cells")
    }
    // rerank is exact cosine: shared pairs match brute-force sims
    val bruteSims = VectorOps.d6AnnBrute(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    full.foreach { r =>
      bruteSims.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(r.getDouble(2) == s, s"rerank sim diverged for ${(r.getLong(0), r.getLong(1))}")
      }
    }
    // recall: cell pruning composed with PQ keeps a usable share of the
    // true top-10 (bounded above by d34's probe recall by construction)
    val brute = bruteSims.keySet
    val recall = (full.map(r => (r.getLong(0), r.getLong(1))).toSet & brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF-PQ recall $recall below floor")
  }

  test("d43 residual IVF-PQ: probed-cell containment, exact rerank, recall not below raw-PQ floor") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val labels = e.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val res = VectorOps.d43AnnIvfPqResidual(spark, sf001).collect()
    res.map(_.getLong(0)).distinct.length shouldBe 20
    res.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.length <= 10)
      val cells = rows.map(r => labels(r.getLong(1))).distinct
      assert(cells.length <= 3, s"query $qid drew neighbors from ${cells.length} cells")
    }
    // rerank is exact cosine over RAW vectors: shared pairs match brute
    val bruteSims = VectorOps.d6AnnBrute(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    res.foreach { r =>
      bruteSims.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(r.getDouble(2) == s, s"rerank sim diverged for ${(r.getLong(0), r.getLong(1))}")
      }
    }
    // recall: residual codes spend resolution on what the coarse
    // quantizer didn't explain — must hold the composed pipeline's floor
    val brute = bruteSims.keySet
    val recall = (res.map(r => (r.getLong(0), r.getLong(1))).toSet & brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"residual IVF-PQ recall $recall below floor")
    // determinism: training + encode + search replay bit-identically
    val again = VectorOps.d43AnnIvfPqResidual(spark, sf001).collect()
    again.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet shouldBe
      res.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("d24 quantization: max_err bounded by scale/2 for unsaturated vectors") {
    val res = VectorOps.d24EmbedQuantize(spark, sf001).collect()
    assert(res.length == graft.Tables.embeddings(spark, sf001).count())
    res.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val err = r.getAs[Double]("max_err")
      // floor(x/scale + 0.5) lands within half a quantization step;
      // the max|v| component hits |q| = 127 exactly, so saturation
      // clamps nothing and the bound holds for every vector (the 1e-6
      // slack covers the 6 dp rounding of both reported columns)
      assert(err <= scale / 2 + 1e-6, s"vec ${r.getLong(0)}: err $err vs scale $scale")
      assert(r.getAs[Long]("n_saturated") >= 1, "the max-abs dim must sit at ±127")
    }
  }
}
