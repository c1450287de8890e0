package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the PHYSICAL plan properties that matter at 100 TB, so a future
  * refactor that silently degrades a plan (full sort instead of top-k,
  * shuffle instead of broadcast, unpushed filter) fails the suite, not
  * the cluster.
  */
class PlanShapeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf001).queryExecution.executedPlan.toString

  test("c8_topk plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("c8_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), s"global sort leaked into top-k:\n$p")
  }

  test("q_revenue_by_nation broadcasts the dimension tables") {
    val p = plan("q_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("c2_filter pushes the predicate into the parquet scan") {
    val p = plan("c2_filter")
    assert(p.contains("PushedFilters: [") && p.contains("StringStartsWith"),
      s"expected startswith predicate pushed to scan:\n$p")
  }

  test("d6_ann_brute broadcasts queries and group-limits before the exchange") {
    val p = plan("d6_ann_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit"), s"top-k should prune before shuffle:\n$p")
  }

  test("d2_minhash_lsh candidate generation is an equi-join, never a cartesian product") {
    val p = plan("d2_minhash_lsh")
    assert(!p.contains("CartesianProduct"), s"LSH must not plan an all-pairs join:\n$p")
  }

  test("d14_ngram_jaccard candidate generation is an equi-join, never a cartesian product") {
    val p = plan("d14_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), s"LSH must not plan an all-pairs join:\n$p")
  }

  test("d12_simhash_neardup candidate generation is a banded equi-join, never a cartesian product") {
    val p = plan("d12_simhash_neardup")
    assert(!p.contains("CartesianProduct"), s"simhash banding must not plan an all-pairs join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"simhash banding must not broadcast the corpus:\n$p")
  }

  test("d16_srp_neardup candidate generation is a banded equi-join, never a cartesian product") {
    val p = plan("d16_srp_neardup")
    assert(!p.contains("CartesianProduct"), s"SRP banding must not plan an all-pairs join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"SRP banding must not broadcast the corpus:\n$p")
  }

  test("d18_corpus_prep composes without a cartesian product (near-dup branch stays banded)") {
    val p = plan("d18_corpus_prep")
    assert(!p.contains("CartesianProduct"), s"pipeline must not plan an all-pairs join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"pipeline must not broadcast the corpus:\n$p")
  }

  test("d18_corpus_prep reads documents in exactly ONE scan (near-dup branch cached)") {
    // r15 first pass fused the canon stage into the annotate projection
    // (5 scans -> 4); this pass moved the near-dup branch onto
    // nearDupPairs' cached lowered-text projection (signature + both
    // verify endpoints read the d2DocsCache, and the verify computes
    // shingle Jaccard from raw texts via the fused WordShingleJaccard
    // kernel instead of joining a materialized shingle side-table).
    // Only d18's own annotate+fp projection still reads parquet.
    val df = SparkEntry.queries("d18_corpus_prep")(spark, sf001)
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected 1 documents scan, got ${scans.size}:\n" +
      df.queryExecution.optimizedPlan.toString)
  }

  test("d9_embed_neardup pairs blocks in a shuffle equi-join — no all-pairs plan, no corpus broadcast") {
    val p = plan("d9_embed_neardup")
    assert(!p.contains("CartesianProduct"), s"blocked self-join must not plan all-pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"blocked self-join must not broadcast the corpus:\n$p")
    assert(p.contains("ShuffledHashJoin"), s"block pairs must meet in a shuffle equi-join:\n$p")
  }

  test("d26_repetition reads documents in exactly ONE scan") {
    // r15: the r14 form scanned the text column three times (two gram
    // scans unioned + the ttr base join); one posexplode over both gram
    // arrays now feeds everything. At 100 TB a redundant scan of the
    // widest column is the single most expensive plan regression.
    val df = SparkEntry.queries("d26_repetition")(spark, sf001)
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected 1 documents scan, got ${scans.size}:\n" +
      df.queryExecution.optimizedPlan.toString)
  }

  test("scan-cached pair ops read their base table in exactly ONE scan") {
    // r15 ScanAudit sweep: d2/d14 read documents three times (signature
    // + both verify endpoints). Each now registers one
    // ReplaceOnCallCache at its choke point; every further consumer
    // reads the cache. A second LogicalRelation reappearing here means
    // a consumer fell off the cached plan — the most expensive silent
    // regression at 100 TB. The cache sits at the root of the only
    // scan, so the optimized plan shows ZERO parquet relations and
    // every consumer meets the one InMemoryRelation (whose cached plan
    // holds the single base scan).
    //
    // d49/d53/d20/d28/d9 were cached the same way mid-r15 and REVERTED
    // on measurement (d49 10.8 -> 17.7 CPU-s cached, d53 5.6 -> 9.7,
    // d9 1.5 -> 2.7, back-to-back same box): with the cached stream's
    // accurate small stats the downstream joins flip to broadcast,
    // broadcast build subtrees get no exchange reuse across branches,
    // and each consumer re-ran the pipeline PLUS the columnar
    // build/read — while the plain form's canonically-equal exchanges
    // ReusedExchange into one kernel pass at runtime. Their intrinsic
    // scan counts are pinned in ScanProfileSpec instead.
    for (q <- Seq("d2_minhash_lsh", "d14_ngram_jaccard")) {
      val df = SparkEntry.queries(q)(spark, sf001)
      val plan = df.queryExecution.optimizedPlan
      val scans = plan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }
      val cached = plan.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
      }
      assert(scans.isEmpty, s"$q: expected every consumer on the cache, " +
        s"got ${scans.size} direct base scans:\n$plan")
      assert(cached.nonEmpty, s"$q: expected the cached choke point in the plan:\n$plan")
    }
  }

  test("d15_frame_sample fans out frames with zero shuffles (Generate pipelined into the scan)") {
    val p = plan("d15_frame_sample")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Exchange"), s"frame sampling is row-local and must not shuffle:\n$p")
  }

  test("d13 kmeans-IVF: assignment is a literal projection; cell probe is the only join") {
    val p = plan("d13_ann_ivf_kmeans")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), s"assignment must not join the centroid table:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"cell probe should hash-join on cid:\n$p")
  }

  test("d21 kmedians-IVF: literal-centroid assignment plans as pure projection (no BNLJ anywhere)") {
    val p = plan("d21_ann_ivf_kmedians")
    assert(!p.contains("CartesianProduct"), p)
    // d13's assign step needs a BNLJ against the centroid table; d21
    // folds the centroids into the expression, so the ONLY join in the
    // whole plan is the cell-probe hash join.
    assert(!p.contains("BroadcastNestedLoopJoin"), s"assignment must not join the centroid table:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"cell probe should hash-join on cid:\n$p")
  }

  test("d19_split_assign is a pure projection — zero exchanges") {
    val p = plan("d19_split_assign")
    assert(!p.contains("Exchange"), s"split assignment is row-local and must not shuffle:\n$p")
  }

  test("d37_bpe_encode's encode pass is key-shuffle-free (only the conditional scan widening)") {
    // training runs its own (bounded) aggregation jobs eagerly; the
    // RETURNED plan is the 100 TB pass — per-row merge application and
    // token accounting. No KEY exchange is allowed; the one permitted
    // exchange is CorpusOps.scanWide's ROUND-ROBIN widening of the
    // pruned scan, which no-ops when the input already fills the
    // session (the 100 TB case — scans arrive thousands of row groups
    // wide) and exists because the gate corpus is ONE parquet row
    // group, which pinned this CPU-heavy kernel to a single task.
    val p = plan("d37_bpe_encode")
    assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
      s"BPE encoding must not key-shuffle:\n$p")
    assert(p.split("Exchange").length - 1 <= 1, s"at most the widening exchange:\n$p")
  }

  test("d24_embed_quantize is a pure projection — zero exchanges") {
    val p = plan("d24_embed_quantize")
    assert(!p.contains("Exchange"), s"quantization is row-local and must not shuffle:\n$p")
  }

  test("d20_contamination broadcasts the eval gram set; corpus grams never shuffle pre-join") {
    val p = plan("d20_contamination")
    assert(p.contains("BroadcastHashJoin"), s"eval grams (benchmark side) must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus grams must not sort-merge:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d22_stratified_sample prunes to top-N per stratum before the exchange (WindowGroupLimit)") {
    val p = plan("d22_stratified_sample")
    assert(p.contains("WindowGroupLimit"), s"per-stratum limit must run map-side:\n$p")
    p.sliding("Exchange hashpartitioning".length).count(_ == "Exchange hashpartitioning") should be <= 1
  }

  test("d28_dup_spans: island merge reuses the doc_id window partitioning — no extra exchange") {
    val p = plan("d28_dup_spans")
    // exactly: gram-count shuffle, dup-set side (broadcast or shuffle),
    // doc_id window shuffle. The final groupBy(doc_id, island) must ride
    // the window's hashpartitioning(doc_id), never re-shuffle.
    p.sliding("Exchange hashpartitioning".length).count(_ == "Exchange hashpartitioning") should be <= 3
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d30_bpe_pairs: map-side pair collapse + top-k without a global sort") {
    val p = plan("d30_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not globally sort:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort leaked into top-k:\n$p")
    // one shuffle: the (pair, partial count) aggregate
    p.sliding("Exchange hashpartitioning".length).count(_ == "Exchange hashpartitioning") should be <= 1
  }

  test("d29_lang_mixture: corpus side joins the broadcast rate table and never shuffles") {
    val p = plan("d29_lang_mixture")
    assert(p.contains("BroadcastHashJoin"), s"rate table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus side must not shuffle for the rate join:\n$p")
  }

  test("GLOBAL: no batch query plans a cartesian product; BNLJ only with a bounded build side") {
    // d6/d31 broadcast the bounded query set by design (SURVEY §8); d23
    // and d29 cross-join a broadcast SINGLE-ROW aggregate (the
    // corpus-size / min-lang-count scalar). Nothing else may nested-loop.
    // Streaming queries (s*) execute on call and are covered by their own
    // gate rows + StreamingSpec.
    val allowedBnlj = Set("d6_ann_brute", "d31_ann_filtered",
      "d23_tfidf_topterms", "d23_tfidf_singlescan", "d29_lang_mixture",
      // k-row centroid table cross-joined per query for cell ranking —
      // bounded build side (one row per IVF cell), the standard IVF
      // coarse-quantizer probe
      "d34_ann_ivf_probes",
      // 20-row query+ADC-table broadcast against the encoded corpus —
      // bounded build side, the asymmetric-distance scoring pass
      "d35_ann_ivf_pq",
      // same bounded build sides composed (cell ranking + ADC tables)
      "d36_ann_ivfpq_full",
      // single-row scored-doc count cross-joined for the tercile split —
      // the d23/d29 scalar pattern
      "d47_ppl_filter",
      // same single-row count scalar, for the 5% suspect cut
      "d67_mink_screen",
      // inherits d47's tercile-count scalar cross-join for the phases
      "d69_curriculum_order",
      // the eval-suite sweep: build side is the held-out eval set — a
      // FIXED benchmark suite in deployment (the gate's %25 slice stands
      // in for it); the corpus side scans broadcast-free, and d56's doc
      // records why exact beats probed pruning here (measured 10/14
      // probe recall — an audit cannot lose recall silently)
      "d56_semantic_contamination")
    SparkEntry.queries.keys.filterNot(_.startsWith("s")).toSeq.sorted.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product:\n$p")
      if (!allowedBnlj(q))
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ:\n$p")
    }
  }

  test("d44_temperature_mix: rank window is bucket-partitioned; offsets and targets broadcast; 2-column scan") {
    val p = plan("d44_temperature_mix")
    // same decomposition discipline as d42: the document-row rank must
    // partition by (lang, draw-bucket), never by lang alone
    assert("windowspecdefinition\\(lang#\\d+, b#\\d+L, draw#\\d+L ASC".r.findFirstIn(p).isDefined,
      s"per-language rank must partition by (lang, bucket):\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort leaked into the selection:\n$p")
    // O(langs x 256) offsets and O(langs) targets both broadcast back
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2,
      s"offsets and targets must both broadcast:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"document scan must prune to (doc_id, lang):\n$p")
  }

  test("d43 residual IVF-PQ: per-cell ADC join broadcasts the probe side; corpus never shuffles to score") {
    val p = plan("d43_ann_ivfpq_residual")
    // queries x nprobe tiny rows broadcast against the encoded corpus —
    // an equi-join on the cell id, so BHJ (not BNLJ, unlike d35's
    // unpruned all-cells scoring pass)
    assert(p.contains("BroadcastHashJoin"), s"the probe side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must not shuffle for ADC scoring:\n$p")
  }

  test("d32_deciles_cutoff assigns buckets Window-free via a broadcast cutoff join") {
    val p = plan("d32_deciles_cutoff")
    assert(p.contains("BroadcastHashJoin"), s"the 9 cutoffs/lang must broadcast:\n$p")
    // the whole point vs exact d32: no per-language total order anywhere
    assert(!p.contains("Window"), s"the cutoff form must not total-order a language:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"no sort may leak in:\n$p")
  }

  test("d23 single-scan twin tokenizes once: exactly one explode vs the baseline's two") {
    def explodes(q: String) =
      "Generate explode".r.findAllIn(plan(q)).length
    assert(explodes("d23_tfidf_singlescan") == 1,
      "tf and df must both derive from ONE token explode")
    assert(explodes("d23_tfidf_topterms") == 2, "the baseline trades a second scan+tokenize")
  }

  test("q_top_orders_per_cust is a single shuffle with in-shuffle group limit") {
    val p = plan("q_top_orders_per_cust")
    assert(p.contains("WindowGroupLimit"), p)
    p.sliding("Exchange hashpartitioning".length).count(_ == "Exchange hashpartitioning") should be <= 2
  }

  test("d39_token_budget: no global sort; documents window is bucket-partitioned; only the 9-row prefix single-partitions") {
    val p = plan("d39_token_budget")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort leaked into the cumsum:\n$p")
    // the document-row window must be PARTITIONED by the quality bucket
    assert("windowspecdefinition\\(b#\\d+L, q_ppm#\\d+L DESC".r.findFirstIn(p).isDefined,
      s"document cumsum must partition by the quality bucket:\n$p")
    // exactly one single-partition exchange — the O(buckets)-row prefix,
    // never document rows
    assert("Exchange SinglePartition".r.findAllIn(p).length == 1,
      s"only the bucket-totals prefix may single-partition:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the 9-row prefix table must broadcast:\n$p")
  }

  test("d40_epoch_mix: one tiny aggregate, broadcast epochs, pipelined explode, 2-column scan") {
    val p = plan("d40_epoch_mix")
    assert(p.contains("BroadcastHashJoin"), s"the O(langs) epochs table must broadcast:\n$p")
    assert(p.contains("Generate explode"), s"upsampling must be a pipelined Generate:\n$p")
    // the single-partition exchange is the O(langs) window max, and the
    // document scan reads only (doc_id, lang) — never text
    assert("Exchange SinglePartition".r.findAllIn(p).length == 1, p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"document scan must prune to (doc_id, lang):\n$p")
  }

  test("d45_dsir_select: zero-shuffle literal scoring; rank window is score-bucket-partitioned; pruned scan") {
    val p = plan("d45_dsir_select")
    // selection rank partitions by the score-space bucket, never a
    // global order over all documents
    assert("windowspecdefinition\\(b#\\d+L, score#\\d+L DESC".r.findFirstIn(p).isDefined,
      s"rank must partition by the score bucket:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort leaked into the selection:\n$p")
    // only the O(buckets) offset table joins back — and it broadcasts
    assert("BroadcastHashJoin".r.findAllIn(p).length == 1,
      s"exactly the offsets join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"document rows must never join-shuffle:\n$p")
    // the scoring scan reads only (doc_id, text): the weight table is a
    // literal in the fold, not a joined relation
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scoring scan must prune to (doc_id, text):\n$p")
  }

  test("d46_semdedup: pairs meet in an equi-join on the cell — no cartesian, no corpus BNLJ") {
    val p = plan("d46_semdedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the within-cell pair join must stay an equi-join:\n$p")
    // embeddings scan stays 3 columns; centroids come from the tiny
    // aggregate, never a re-scan of a wider projection
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>,label:int>"),
      s"embeddings scan must stay (vec_id, embedding, label):\n$p")
  }

  test("d47_ppl_filter: zero-shuffle literal scoring; tercile rank is score-bucket-partitioned") {
    val p = plan("d47_ppl_filter")
    assert("windowspecdefinition\\(b#\\d+L, avg_fx#\\d+L DESC".r.findFirstIn(p).isDefined,
      s"tercile rank must partition by the score bucket:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort leaked into the terciles:\n$p")
    // LM tables are literals in the scoring fold: no join carries them,
    // and the scan feeding the fold reads only (doc_id, text)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"document rows must never join-shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scoring scan must prune to (doc_id, text):\n$p")
  }

  test("d67_mink_screen: zero-shuffle literal scoring; suspect rank is score-bucket-partitioned") {
    val p = plan("d67_mink_screen")
    assert("windowspecdefinition\\(b#\\d+L, mink_fx#\\d+L DESC".r.findFirstIn(p).isDefined,
      s"suspect rank must partition by the score bucket:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort leaked into the rank:\n$p")
    // LM tables are literals in the term array; the per-doc sort is
    // array_sort inside the scan — document rows never join-shuffle
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"document rows must never join-shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scoring scan must prune to (doc_id, text):\n$p")
  }

  test("d69_curriculum_order: the position rank is (phase, draw)-bucket-partitioned, no global sort") {
    val p = plan("d69_curriculum_order")
    assert("windowspecdefinition\\(b#\\d+L, phase_idx#\\d+L ASC".r.findFirstIn(p).isDefined,
      s"position rank must partition by the phase/draw bucket:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"global sort leaked into the curriculum order:\n$p")
  }

  test("d71_snapshot_diff: one fp-keyed aggregate shuffle, no join — the d1 shape") {
    val p = plan("d71_snapshot_diff")
    assert(!p.contains("Join"), s"no join may appear (conditional counts only):\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"exactly one shuffle (the fp aggregate):\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"diff scan must prune to (doc_id, text):\n$p")
  }

  test("d48_split_leakage: one fp-keyed shuffle, no join — the d1/d41 window shape") {
    val p = plan("d48_split_leakage")
    assert("windowspecdefinition\\(fp#\\d+".r.findFirstIn(p).isDefined,
      s"leakage must ride the fp-partitioned window:\n$p")
    assert(!p.contains("Join"), s"no join may appear (window composition only):\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"exactly one shuffle (the fp window):\n$p")
  }

  test("d49_containment: candidates from the window-hash equi-join; hot list excluded via broadcast anti join") {
    val p = plan("d49_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi-join:\n$p")
    // the stop-window exclusion is a broadcast ANTI join — the corpus
    // gram stream must not shuffle a second time to subtract the tiny
    // hot list
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined,
      s"hot-window exclusion must be a broadcast anti join:\n$p")
  }

  test("d50_training_plan: every stage stays decomposed — no global sort, no cartesian, bucketed windows") {
    val p = plan("d50_training_plan")
    assert(!p.contains("Exchange rangepartitioning"), s"a global sort leaked into the plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no stage may nested-loop:\n$p")
    // the selection and interleave ranks partition by (group, bucket),
    // the packing cumsum by its round bucket — never a single partition
    // over document rows
    assert("windowspecdefinition\\(lang#\\d+, b#\\d+L, dtemp#\\d+L ASC".r.findFirstIn(p).isDefined,
      s"temperature rank must partition by (lang, bucket):\n$p")
    assert("windowspecdefinition\\(source#\\d+, b#\\d+L, dorder#\\d+L ASC".r.findFirstIn(p).isDefined,
      s"interleave rank must partition by (source, bucket):\n$p")
    assert("windowspecdefinition\\(pb#\\d+L, round#\\d+L ASC".r.findFirstIn(p).isDefined,
      s"packing cumsum must partition by the round bucket:\n$p")
    // the staged frames are persisted, not re-derived from the text scan
    assert(p.contains("InMemoryTableScan"), s"staged frames must persist:\n$p")
  }

  test("d70_shard_manifest: the manifest rollup adds NO join to d50's plan") {
    // d50's public schema carries n_tokens, so the manifest is a pure
    // groupBy rollup — a re-attach equi-join against the corpus would
    // re-shuffle O(docs) rows for a column the plan already has
    val p = plan("d70_shard_manifest")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"manifest rollup must not join document rows:\n$p")
  }

  test("d42_interleave_order: rank window is bucket-partitioned; ONE offsets broadcast carries slot; no global sort") {
    val p = plan("d42_interleave_order")
    // the document-row rank must partition by (source, draw-bucket) —
    // never by source alone (that caps parallelism at #sources) and
    // never a global order (rangepartitioning)
    assert("windowspecdefinition\\(source#\\d+, b#\\d+L, draw#\\d+L ASC".r.findFirstIn(p).isDefined,
      s"within-source rank must partition by (source, bucket):\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort leaked into the interleave:\n$p")
    // r15: the slot (source dense index) rides the SAME O(sources x 256)
    // offsets broadcast as the rank offsets (bucketRank withGroupIndex) —
    // exactly ONE broadcast join, document rows never join-shuffle
    assert("BroadcastHashJoin".r.findAllIn(p).length == 1,
      s"exactly one offsets broadcast (slot rides it):\n$p")
    assert(p.contains("gidx"), s"slot must come from the offsets table's gidx:\n$p")
    // document scan reads only (doc_id, source) — never text
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      s"document scan must prune to (doc_id, source):\n$p")
  }

  // ---- fused-kernel single-reference discipline ------------------------
  //
  // The streamed gates filter on the scored value and predicate pushdown
  // inlines the scoring expression into the filter condition — so the
  // optimized plan legitimately holds exactly TWO kernel references: one
  // in the pushed filter, one in the output projection (filter-and-emit
  // of the same value; rejected rows pay only the filter's). The
  // regression class these pins guard is anything ABOVE two: the
  // composed (transform/zip_with/aggregate) forms duplicated the
  // per-token hash pass INSIDE each site under the same rewrite
  // (measured 2x s21 cpu in r12, 5.6x before the zip_with shape), and a
  // refactor that splits the kernel back into hash + score sub-
  // expressions would reintroduce that multiplicity.

  private def occurrences(hay: String, needle: String): Int =
    needle.r.findAllIn(hay).length

  test("lm_score_fx appears exactly twice under a score filter — pushed filter + projection, nothing more") {
    // parquet-backed: ConvertToLocalRelation would evaluate a literal
    // relation at optimize time and hide the rewrite under test
    val fn = org.apache.spark.sql.functions
    val docs = graft.Tables.documents(spark, sf001)
      .select(fn.col("doc_id"), (fn.col("lang") === "en").as("is_target"), fn.col("text"))
    val big = Array.fill(4096)(5L)
    val ctx = Array.fill(256)(3L)
    val ppl = CorpusOps.pplScored(docs, big, ctx)
      .filter(fn.col("avg_fx") >= 100L)
      .queryExecution.optimizedPlan.toString
    assert(occurrences(ppl, "lm_score_fx") == 2,
      s"LM scoring kernel reference count drifted:\n$ppl")
    val mink = CorpusOps.minkScored(docs, big, ctx)
      .filter(fn.col("mink_fx") >= 100L)
      .queryExecution.optimizedPlan.toString
    assert(occurrences(mink, "lm_score_fx") == 2,
      s"Min-K scoring kernel reference count drifted:\n$mink")
  }

  test("rare_count_fx appears exactly twice under the gate's admission filter") {
    val fn = org.apache.spark.sql.functions
    val docs = graft.Tables.documents(spark, sf001)
      .select(fn.col("doc_id"), fn.col("text"))
    val p = CorpusOps.rareScored(docs, Seq.fill(4096 * 3)(7L), 1000L)
      .filter(fn.col("rare_ppm") < 10L)
      .queryExecution.optimizedPlan.toString
    assert(occurrences(p, "rare_count_fx") == 2,
      s"CMS probe kernel reference count drifted:\n$p")
  }
}
