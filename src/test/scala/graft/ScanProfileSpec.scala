package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins every batch query's INTRINSIC physical file-scan count — the
  * mechanized form of the r15 ScanAudit sweep that found operators
  * re-reading the text/embedding column up to six times in one plan.
  * A count going UP is the most expensive silent plan regression at
  * 100 TB (a consumer fell off its cached choke point, or a new branch
  * re-derived an expensive projection); a count going DOWN is an
  * improvement that should be recorded here. Counts of 0 mean the
  * query's only scans live inside its own ReplaceOnCallCache
  * registration (the cache subsumes them); the live caches are cleared
  * before each plan build so the count never depends on which queries
  * ran earlier (CacheManager substitutes any matching subtree at plan
  * time — real and useful at runtime, order-dependent noise here).
  *
  * d49(6)/d53(4)/d20(2)/d28(2)/d9(2) are deliberate count INCREASES:
  * their mid-r15 choke-point caches re-measured SLOWER (accurate
  * small in-memory stats flip downstream joins to broadcast, whose
  * build subtrees get no exchange reuse across branches — each
  * consumer re-ran the pipeline plus the cache's columnar build —
  * while the plain forms' canonically-equal exchanges ReusedExchange
  * into one kernel pass at runtime; see the notes at the sites).
  * The logical scan count here is therefore HIGHER than the physical
  * pass count those plans execute.
  *
  * Multi-scan rows are BY DESIGN and documented at their sites:
  * multi-table TPC-H joins (each scan a different table), ANN
  * train/encode/fetch stages (sampled training at deployment),
  * d61/d23's two-scan baselines, d42/d44's cheap narrow projections,
  * c6/q2/q3's two-sided set semantics.
  */
class ScanProfileSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val expected = Map(
    "c1_project" -> 1, "c2_filter" -> 1, "c3_grouped" -> 1,
    "c4_explode" -> 1, "c5_perkey_order" -> 1, "c6_union" -> 2,
    "c8_topk" -> 1,
    "d1_exact_dedup" -> 1, "d2_minhash_lsh" -> 0, "d3_text_stats" -> 1,
    "d4_langid" -> 1, "d5_simhash" -> 1, "d6_ann_brute" -> 2,
    "d7_ann_ivf" -> 2, "d8_multimodal_decode" -> 2, "d9_embed_neardup" -> 2,
    "d10_rolling_hash" -> 1, "d11_quality" -> 1, "d12_simhash_neardup" -> 1,
    "d13_ann_ivf_kmeans" -> 0, "d14_ngram_jaccard" -> 0,
    "d15_frame_sample" -> 1, "d16_srp_neardup" -> 0, "d17_resize" -> 1,
    "d18_corpus_prep" -> 1, "d19_split_assign" -> 1,
    "d20_contamination" -> 2, "d21_ann_ivf_kmedians" -> 0,
    "d22_stratified_sample" -> 1, "d23_tfidf_singlescan" -> 2,
    "d23_tfidf_topterms" -> 3, "d24_embed_quantize" -> 1,
    "d25_dedup_clusters" -> 0, "d26_repetition" -> 1,
    "d27_pack_chunks" -> 2, "d28_dup_spans" -> 2, "d29_lang_mixture" -> 2,
    "d30_bpe_pairs" -> 1, "d31_ann_filtered" -> 3,
    "d32_deciles_cutoff" -> 0, "d32_quality_deciles" -> 1,
    "d33_bpe_train" -> 0, "d34_ann_ivf_probes" -> 3,
    "d35_ann_ivf_pq" -> 2, "d36_ann_ivfpq_full" -> 5,
    "d37_bpe_encode" -> 1, "d38_pii_redact" -> 1, "d39_token_budget" -> 0,
    "d40_epoch_mix" -> 2, "d41_soft_dedup" -> 1,
    "d42_interleave_order" -> 2, "d43_ann_ivfpq_residual" -> 2,
    "d44_temperature_mix" -> 3, "d45_dsir_select" -> 0,
    "d46_semdedup" -> 0, "d47_ppl_filter" -> 0, "d48_split_leakage" -> 1,
    "d49_containment" -> 6, "d50_training_plan" -> 0,
    "d51_containment_clusters" -> 0, "d52_winnow" -> 1,
    "d53_winnow_overlap" -> 4, "d54_bm25" -> 0, "d55_d4_select" -> 0,
    "d56_semantic_contamination" -> 2, "d57_corpus_report" -> 1,
    "d58_knn_graph" -> 0, "d59_hashed_embed" -> 1,
    "d60_semantic_clusters" -> 0, "d61_span_scrub" -> 2,
    "d62_bloom_gate" -> 1, "d63_chain_components" -> 0,
    "d64_novelty" -> 1, "d65_group_split" -> 1, "d66_novelty_gate" -> 1,
    "d67_mink_screen" -> 0, "d68_cluster_cap" -> 0,
    "d69_curriculum_order" -> 0, "d70_shard_manifest" -> 1,
    "d71_snapshot_diff" -> 1, "d72_heavy_hitters" -> 0,
    "d73_rare_gate" -> 1, "d74_token_fertility" -> 1,
    "o10_seek_timestamp" -> 1,
    "q1_groupbykey" -> 1, "q2_dedup_replay" -> 2, "q3_except" -> 2,
    "q3_intersect" -> 2,
    "q_approx_stats" -> 1, "q_asof_signup" -> 1,
    "q_brand_supplier_revenue" -> 4, "q_cust_no_urgent" -> 2,
    "q_cust_with_orders" -> 2, "q_distinct_suppliers" -> 1,
    "q_percentiles" -> 1, "q_pivot_priority" -> 1,
    "q_pricing_summary" -> 1, "q_revenue_by_nation" -> 5,
    "q_rollup_revenue" -> 4, "q_salted_join" -> 2, "q_session_window" -> 1,
    "q_sessionize" -> 1, "q_top_orders_per_cust" -> 1,
  )

  test("every batch query's file-scan count matches the committed profile") {
    val batch = SparkEntry.queries.keys.filterNot(_.startsWith("s")).toSeq.sorted
    // every batch query must be in the table — a new query without a
    // recorded profile is itself a finding
    val missing = batch.filterNot(expected.contains)
    assert(missing.isEmpty, s"queries without a committed scan profile: $missing")
    val diffs = batch.flatMap { name =>
      spark.catalog.clearCache()
      val n = ScanAudit.fileScans(SparkEntry.queries(name)(spark, sf001)).size
      if (n != expected(name)) Some(s"$name: expected ${expected(name)}, got $n") else None
    }
    withClue(diffs.mkString("\n")) { diffs shouldBe empty }
  }
}
