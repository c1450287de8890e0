package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table
  * (`vec_id, embedding FLOAT[], label`).
  *
  * Two paths:
  *  - [[d6AnnBrute]] — exact brute-force top-k cosine for a bounded query
  *    set. The query side is broadcast, so the "cross" join is a broadcast
  *    nested loop over ONE scan of the corpus: no shuffle of the corpus,
  *    embarrassingly parallel, and the right baseline/re-ranker at any
  *    scale as long as |queries| is small.
  *  - [[d7AnnIvf]] — the 100 TB path: IVF-style cell-probed search. The
  *    `label` column is the precomputed coarse-quantizer cell assignment
  *    (at scale: k-means centroid ids); each query probes only its own
  *    cell, so the candidate join is an equi-join on the cell id and the
  *    per-cell exact re-rank touches |corpus| / n_cells vectors per query.
  *
  * All arithmetic is double (float32 inputs cast up), accumulated in array
  * order via `aggregate(zip_with(...))`, which makes results bit-stable
  * and oracle-comparable.
  */
object VectorOps {

  private val K = 10
  private val NumQueries = 20

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Cosine via the native codegen'd kernel (graft.functions.
    * CosineSimilarity): one fused loop for dot + both norms, bit-identical
    * to the composed `aggregate(zip_with(...))` form and to the oracle.
    */
  private[graft] def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosineSim(a, b)

  /** The per-vector squared norm — computed once in the scan projection
    * and carried through the tile replication so the quadratic pair
    * stages pay only the dot product. The decomposition's bit-parity
    * contract (sequential dot + carried norms ≡ the fused
    * [[graft.functions.CosineSimilarity]] kernel, raw IEEE bits) is
    * pinned by CosinePartsSpec over [[graft.functions.DotProduct]] /
    * [[graft.functions.SumSquares]]; the tile kernels
    * ([[graft.functions.BlockPairsFx]]) emit exactly that decomposed
    * value, pinned again by BlockPairsFxSpec.
    */
  private def sumSq(v: Column): Column = graft.functions.SumSquares.sumSquares(v)

  private def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"), col("label"))

  private def topK(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"), col("rn"))
  }

  /** Exact top-k cosine neighbors for queries `vec_id < 20` against the
    * full corpus (self excluded). Broadcast the tiny query side; the corpus
    * is scanned once with no shuffle; per-query top-k is one window pass.
    */
  def d6AnnBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("qv"), col("v")).as("sim"))
    topK(scored)
  }

  /** FILTERED ANN — the "hybrid search" every production vector store
    * needs: top-k cosine neighbors restricted by a METADATA predicate
    * (here: the document's language, via the documents↔embeddings PK
    * join). The predicate applies BEFORE any distance math — filter-
    * then-search, not search-then-filter, which at selective predicates
    * both wastes distance compute and under-fills k.
    *
    * SCALE: the metadata predicate is pushed to the documents scan
    * (column-pruned to (doc_id, lang)); the PK equi-join prunes the
    * vector side before the broadcast-query scoring pass, which then
    * runs exactly like [[d6AnnBrute]] on the survivors — no shuffle of
    * the vector side beyond the PK join, per-query top-k in one window
    * pass over group-limited rows.
    */
  def d31AnnFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embeddings(spark, sfDir)
    val enIds = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en").select(col("doc_id").as("vec_id"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.join(enIds, "vec_id")
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("qv"), col("v")).as("sim"))
    topK(scored)
  }

  /** Block edge length for the per-cell blocked pair stages (d46/d55/
    * d58). Per-task memory is O(2·B·dim); B is small here so the fixture
    * corpora exercise several block pairs — at 100 TB you size B so one
    * block pair (~2·B·dim·8 bytes of vectors) fits an executor core's
    * working set.
    */
  private val BlockSize = 256L

  /** DATA-SIZED block edge for d9's GLOBAL blocked self-join. The blocked
    * self-join's shuffle volume is N·nBlocks = N²/B (every vector
    * replicates to its block's ~nBlocks pair keys), so a FIXED edge makes
    * replication grow linearly with the corpus while per-task memory
    * stays needlessly tiny. Sizing the edge to hold the grid near
    * [[D9TargetBlocks]] blocks keeps replication ~constant until the
    * [[D9MaxBlockEdge]] per-task-memory cap binds (2·2048 vectors ≈ 2.2
    * MB/task at dim 64 — at deployment dims, lower the cap to the
    * documented working-set rule). The floor keeps fixture-scale behavior
    * identical to the fixed-edge form. Blocking is pure partitioning —
    * which tile a pair is scored in — so the emitted pair set and every
    * similarity bit are invariant to B (BlockPairsFxSpec's exactness
    * argument is per pair; VectorOpsSpec pins d9 across edges).
    *
    * `nVec` is taken as max(vec_id)+1 — a DENSE-ID assumption (true of
    * the fixture tables and the generator contract). A sparse or offset
    * id space overestimates N, which only MISSIZES the heuristic (edge
    * too large → fewer, fatter blocks; correctness unaffected, blocking
    * being pure partitioning). If ids ever stop being dense, size from
    * count() instead — one extra scalar job.
    */
  private[graft] def d9BlockEdge(nVec: Long): Long =
    math.min(D9MaxBlockEdge, math.max(BlockSize, (nVec + D9TargetBlocks - 1) / D9TargetBlocks))
  private val D9TargetBlocks = 32L
  private val D9MaxBlockEdge = 2048L

  /** Embedding-cosine near-duplicate pairs: exact all-pairs self-similarity
    * at a threshold. Exact low-threshold pair search is inherently
    * quadratic — no LSH family guarantees recall at moderate thresholds —
    * so the honest scale story is a BLOCKED exact self-join: vectors are
    * tiled into blocks of [[d9BlockEdge]] by id, each side is replicated to
    * the (lo, hi) block pairs it participates in, and the pairs meet in a
    * SHUFFLE hash equi-join on the block-pair key. Each task scores one
    * block pair with the fused native kernel: O(B²) compares and O(B·dim)
    * memory per task, no broadcast of the corpus, no driver state — the
    * O(N²) total work is spread over N²/B² independent tasks. (For high
    * thresholds, the MinHash-LSH pattern of [[CorpusOps]] applies to
    * sign-random-projection sketches instead; at 0.45 SRP banding has no
    * recall guarantee, so exact blocking is the correct operator.)
    * Corpus here has no planted embedding dups, so the threshold 0.45
    * exercises the operator on the distribution's tail.
    */
  def d9EmbedNeardup(spark: SparkSession, sfDir: String): DataFrame =
    d9EmbedNeardupOver(embeddings(spark, sfDir))

  /** [[d9EmbedNeardup]]'s core over any `(vec_id, v)` relation, with the
    * block edge overridable for the edge-invariance spec (None = the
    * data-sized [[d9BlockEdge]]).
    */
  private[graft] def d9EmbedNeardupOver(src: DataFrame,
      edgeOverride: Option[Long] = None): DataFrame = {
    // n2 rides the block replication: the squared norm is per-VECTOR
    // (linear), so the O(B^2) pair work pays only the dot product — and
    // since r14 the whole B x B tile is scored by ONE kernel call
    // (graft.functions.BlockPairsFx) from primitive arrays, with a
    // reassociated fast-dot screen and the exact in-order fold only for
    // survivors (emitted sims bit-identical to the cosineFromParts
    // composition, BlockPairsFxSpec pins raw bits)
    // One O(1) scalar job to size the block grid — the analog of the stats
    // collection AQE does before picking a join strategy. Not a data scan
    // loop: a single max() aggregate returning one long to the driver.
    // The edge is DATA-SIZED (see d9BlockEdge): replication stays ~flat
    // as the corpus grows until the per-task memory cap binds.
    val nVec = src.agg(coalesce(max(col("vec_id")), lit(-1L))).head().getLong(0) + 1
    val edge = edgeOverride.getOrElse(d9BlockEdge(nVec))
    val nBlocks = (math.max(nVec, 1L) + edge - 1) / edge
    val e = src.withColumn("blk", floor(col("vec_id") / edge))
      .withColumn("n2", sumSq(col("v")))
    // Each block's vectors gather ONCE (one tiny N/B-group aggregation),
    // then the GROUPED row replicates to its block pairs: as the lo side
    // for pairs (b, hi), hi in [b, nBlocks); as the hi side for (lo, b),
    // lo in [0, b]. Shuffle volume is the same per-vector replication as
    // the old per-row join; per-task memory is one tile = 2·B vectors
    // (the documented block contract). The diagonal pair (b, b) gets the
    // same list on both sides; the kernel's diag mode scores i < j once.
    val item = struct(col("vec_id").as("id"), col("v"), col("n2"), lit(0.0).as("aux"))
    // NOT cached (unlike d46/d58's tiles): the gather aggregation's
    // exchange is canonically identical under both replicated sides, so
    // ReusedExchange already runs the scan+gather once at runtime; the
    // r15 tile cache here only added the columnar build of the vector
    // tiles (d9 0.7 -> 1.4 bench CPU-s, reverted). d46/d58 keep theirs
    // because their tiles feed MANY differently-shaped consumers the
    // exchange cannot serve.
    val blocks = e.select(col("blk"), item.as("it"))
      .groupBy(col("blk")).agg(collect_list(col("it")).as("items"))
    val lo = blocks.select(col("blk").as("lo"),
      explode(sequence(col("blk"), lit(nBlocks - 1))).as("hi"), col("items").as("as_"))
    val hi = blocks.select(explode(sequence(lit(0L), col("blk"))).as("lo"),
      col("blk").as("hi"), col("items").as("bs_"))
    // shuffle_hash: replicated sides grow with the block count, so neither
    // may ever be broadcast — the pair key distributes them instead.
    lo.hint("shuffle_hash").join(hi, Seq("lo", "hi"))
      .select(explode(graft.functions.BlockPairsFx.pairsAboveFx(
        col("as_"), col("bs_"), col("lo") === col("hi"), 0.45)).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        round(col("p.sim"), 6).as("sim"))
  }

  // d16 parameters: 8 bands x 16 bits of sign-random-projection signature.
  // SRP banding is sound exactly where d9's doc says blocking is not
  // needed: HIGH thresholds. At the 0.9 output threshold a true pair has
  // per-bit agreement p = 1 - acos(sim)/pi >= 0.856, so a band matches
  // with p^16 and 8 bands miss with (1-p^16)^8 <= 2e-3 at sim exactly 0.9
  // — and the pairs this operator exists for (near-identical embeddings,
  // sim >= 0.999, p >= 0.986) miss with < 1e-10. Background pairs
  // (sim <= 0.6 everywhere in this corpus) collide per band at <= 3e-4,
  // so the verify set stays O(true pairs + a few hundred), never O(N^2).
  private val SrpBands = 8
  private val SrpBitsPerBand = 16
  private val SrpDim = 64
  private val SrpSeed = 0x6ea1f00dL
  private val SrpThreshold = 0.9
  private val PlantedN = 50L
  private val PlantedIdOffset = 10000L

  /** The corpus for [[d16SrpNeardup]]: the embeddings table PLUS a
    * deterministically perturbed copy of the first [[PlantedN]] vectors
    * (`v' = 0.99*v + 0.001`, cosine(v, v') ~ 0.99997). The fixture corpus
    * has no natural high-similarity pairs (max ~0.6), so the planted twins
    * are what makes a high-threshold near-dup query observable — and the
    * perturbation is plain element-wise arithmetic, so the DuckDB oracle
    * constructs the identical corpus and the gate stays a brute-force
    * hash compare.
    */
  private def plantedCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    // one scan, not union-of-two: each row explodes into itself plus —
    // for the first PlantedN ids — its perturbed twin (the union form
    // read the embedding table twice; output rows identical, order-free)
    val self = struct(col("vec_id"), col("v"))
    val twin = struct((col("vec_id") + PlantedIdOffset).as("vec_id"),
      transform(col("v"), x => x * lit(0.99) + lit(0.001)).as("v"))
    embeddings(spark, sfDir).select(col("vec_id"), col("v"))
      .select(explode(when(col("vec_id") < PlantedN, array(self, twin))
        .otherwise(array(self))).as("r"))
      .select(col("r.vec_id").as("vec_id"), col("r.v").as("v"))
  }

  /** SRP-LSH near-duplicate pairs over any `(vec_id, v: array<double>)`
    * corpus — the sub-quadratic HIGH-threshold complement to
    * [[d9EmbedNeardup]]'s exact blocked self-join: signature per row (one
    * fused kernel pass, no shuffle), band into equi-join keys, exact-cosine
    * verify only the candidates. Candidate generation is an equi-join on
    * (band_id, band_key) — never all-pairs — and the banded shuffle carries
    * only (id, band_id, key); vectors are joined back for the O(candidates)
    * verify, so nothing O(N·dim) is ever broadcast or replicated.
    */
  /** [[srpNearDupPairs]]'s one live corpus cache: the `(vec_id, v)`
    * relation feeds the signature kernel AND both verify join sides —
    * ScanAudit read SIX embedding scans for d16 (the planted-corpus
    * union doubled every consumer's scan count) — now one. The persist
    * is one spill-ready copy of the vector corpus
    * ([[ReplaceOnCallCache]]; the d2DocsCache trade for vectors).
    */
  private val srpCorpusCache = new ReplaceOnCallCache

  def srpNearDupPairs(rawCorpus: DataFrame, threshold: Double, seed: Long = SrpSeed): DataFrame = {
    val corpus = srpCorpusCache.register(rawCorpus)
    // coalesce: provably non-nullable band keys, else the optimizer pushes
    // IsNotNull below the Generate and re-runs the signature kernel per
    // row per join side (the d12 lesson, CorpusOps.scala).
    val sig = corpus.select(col("vec_id").as("doc_id"),
      coalesce(graft.functions.SrpSignature.srpSignature(
        col("v"), SrpBands, SrpBitsPerBand, SrpDim, seed), array(lit(-1L))).as("keys"))
    val banded = sig.select(col("doc_id"),
      posexplode(col("keys")).as(Seq("band_id", "band_key")))
    val va = corpus.select(col("vec_id").as("a_id"), col("v").as("va"))
    val vb = corpus.select(col("vec_id").as("b_id"), col("v").as("vb"))
    CorpusOps.candidatePairsFromBands(banded)
      .join(va, "a_id").join(vb, "b_id")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("sim"), 6).as("sim"))
  }

  /** Gate query: SRP-LSH near-dup pairs at 0.9 over the planted corpus.
    * Expected output = exactly the [[PlantedN]] (source, twin) pairs; the
    * oracle is the full brute-force quadratic join, so any banding recall
    * miss or verify divergence fails the hash compare.
    */
  def d16SrpNeardup(spark: SparkSession, sfDir: String): DataFrame =
    srpNearDupPairs(plantedCorpus(spark, sfDir), SrpThreshold)

  /** Distributed Lloyd's k-means over the embedding column — a REAL coarse
    * quantizer for IVF (d7 uses the precomputed `label` column as its
    * cells; this trains cells from the vectors themselves). Each iteration
    * is one broadcast join of the k×dim centroid table against the corpus
    * (argmin via a `min(struct(dist, cid))` aggregate — deterministic,
    * ties to the lowest cid) and one (cid, dim, value) explode/groupBy for
    * the centroid update. Centroids live in a k×dim driver-side array
    * between iterations — the standard driver-resident centroid model
    * (Spark MLlib's KMeans does the same); the corpus itself never leaves
    * the executors. Seeds are the k lowest vec_ids. Training is fully
    * deterministic end to end: assignment is an argmin over one collected
    * centroid set with fixed arithmetic, and the mean update accumulates
    * exact integers (see [[kmeansCentroids]]) so even independent
    * trainings are bit-identical. At 100 TB: train the quantizer on a
    * sample, then assign the full corpus with the one final broadcast
    * pass this returns.
    *
    * Returns (vec_id, v, cid).
    */
  /** One assignment pass: nearest trained centroid per vector (squared
    * L2, sequential accumulation; ties break to the lowest cid).
    */
  /** Argmin cell assignment as a zero-shuffle literal projection (see
    * [[nearestCidLit]]). The earlier join-the-centroid-table form cost a
    * BroadcastNestedLoopJoin plus a full-corpus groupBy shuffle PER
    * ITERATION; folding the k centroids into the expression leaves the
    * corpus in place — same `(d, cid)` struct-min semantics, bit-identical
    * assignments.
    */
  def assignToCentroids(e: DataFrame, centroids: Seq[(Int, Seq[Double])]): DataFrame =
    e.select(col("vec_id"), col("v"), nearestCidLit(centroids).as("cid"))

  /** The trained centroid table after `iters` Lloyd iterations.
    *
    * The mean update uses EXACT INTEGER accumulation (each coordinate
    * floor-quantized to 2^20ths and summed as longs — [[labelCentroidsExact]]'s
    * d34 technique): a float `avg()` is subject to aggregation order like
    * any shuffle reduction, so two trainings could differ by ulps and no
    * external engine could replay one. The quantized mean is order-FREE —
    * bit-identical across runs, sessions, partitionings, and engines —
    * at a per-coordinate cost of < 2^-20, far below any clustering
    * signal. This is what lets d13's full training + search pipeline be
    * DuckDB-oracled instead of rows-only.
    */
  def kmeansCentroids(e: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    val Scale = 1048576L // 2^20, matching labelCentroidsExact
    var centroids: Seq[(Int, Seq[Double])] = e.orderBy(col("vec_id")).limit(k)
      .select(col("v")).collect().toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }
    for (_ <- 0 until iters) {
      centroids = assignToCentroids(e, centroids)
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(floor(col("x") * Scale).cast("long")).as("sq"), count(lit(1)).as("n"))
        .withColumn("m", col("sq") / (col("n") * lit(Scale.toDouble)))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").as("cv"))
        .collect().toSeq
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
    }
    centroids
  }

  def kmeansAssign(e: DataFrame, k: Int, iters: Int): DataFrame =
    assignToCentroids(e, kmeansCentroids(e, k, iters))

  /** Sample-trained k-means assignment — the 100 TB form the
    * [[kmeansCentroids]] doc promises: Lloyd iterations touch only a
    * deterministic 1-in-`sampleMod` id-hash sample (every per-iteration
    * broadcast join, centroid-update explode/groupBy, and driver collect
    * shrinks by that factor), then ONE full-corpus broadcast pass assigns
    * every vector to the trained cells. Centroid quality degrades only
    * with sampling error in the cell means — for coarse IVF quantization
    * (cells, not classifications) a few percent of the corpus is ample.
    * The sample is keyed on `pmod(vec_id, sampleMod)` so training is
    * reproducible across runs and sessions.
    */
  def kmeansAssignSampled(e: DataFrame, k: Int, iters: Int, sampleMod: Int): DataFrame =
    assignToCentroids(e,
      kmeansCentroids(e.filter(pmod(col("vec_id"), lit(sampleMod)) === 0), k, iters))

  /** Cell-probed exact-rerank ANN over any `(vec_id, v, cid)` cell
    * assignment: each query searches only its own cell, like
    * [[d7AnnIvf]]. `cells` appears on BOTH sides of the join, so it is
    * persisted: without the cache each side would re-evaluate the
    * assignment — re-scanning the corpus and, worse, CODEGENING the
    * k×dim literal-centroid argmin of [[nearestCidLit]] twice (the
    * expression folds every centroid coordinate into one generated
    * method; compiling it dominated d13's ~11 s cold start). With the
    * cache both sides read one InMemoryRelation: one scan, one compile.
    * The cached assignment is (vec_id, v, cid) — corpus-sized but
    * column-pruned. The function OWNS the cache lifetime ONLY when it
    * created the cache: each call unpersists the previous call's OWN
    * assignment (the cached plan is function-local, so no caller could),
    * bounding a session to ONE live function-owned cache no matter how
    * many times it runs; a superseded call's returned DataFrame stays
    * correct (it recomputes from lineage, just uncached). An input the
    * CALLER already persisted is used as-is and never unpersisted here —
    * their cache, their lifetime (and two alternating pipelines over
    * caller-cached assignments don't thrash). [[releaseCellCache]] frees
    * the last function-owned cache deterministically. At 100 TB the
    * assignment is written once to a table rather than cached, as the
    * [[kmeansAssignSampled]] doc describes.
    */
  def annIvfOverCells(cells: DataFrame): DataFrame = {
    val callerPersisted = cells.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cached = if (callerPersisted) cells else lastCellCache.register(cells)
    val q = cached.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("cid").as("q_cid"))
    val scored = cached.join(broadcast(q),
        col("cid") === col("q_cid") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("qv"), col("v")).as("sim"))
    topK(scored)
  }

  /** The one live cell-assignment cache [[annIvfOverCells]] maintains —
    * see its doc and the [[ReplaceOnCallCache]] lifetime contract.
    */
  private val lastCellCache = new ReplaceOnCallCache

  /** Release the last [[annIvfOverCells]] assignment cache (no-op when
    * none is live). Harness `scrub`s call `clearCache()` which also
    * covers it; this is the targeted form for library users.
    */
  def releaseCellCache(): Unit = lastCellCache.release()

  /** IVF ANN over TRAINED cells: [[kmeansAssign]] quantizes the corpus,
    * then each query probes only its own cell and exact-reranks. Both join
    * sides derive from the single centroid set that training collected, so
    * query and corpus always agree on cells. Oracle-checked end to end
    * (closing the last rows-only ANN row): the exact-integer mean update
    * makes all three Lloyd iterations order-free, so the DuckDB oracle
    * replays training, assignment and cell-probe search hash-exactly
    * (d21's unrolled-iteration technique with d34's quantized-mean
    * update). VectorOpsSpec additionally pins: assignments are bit-exact
    * argmins, neighbors share the query's cell, similarities agree with
    * the brute-force scorer.
    */
  def d13AnnIvfKmeans(spark: SparkSession, sfDir: String): DataFrame =
    annIvfOverCells(kmeansAssignSampled(embeddings(spark, sfDir), k = 8, iters = 3,
      sampleMod = 4))

  /** d34: IVF ANN with MULTI-CELL probing (`nprobe` = 2) — the standard
    * IVF refinement d7 lacks: probing ONLY the query's own cell misses
    * true neighbors that sit just across a cell boundary, so real IVF
    * indexes rank cells by centroid distance and probe the nearest few.
    * Per query: rank all cells by squared distance to the cell centroid
    * (ties by label), probe the top 2, exact-rerank top-k — recall can
    * only improve over single-probe at ~2x the probe cost, still
    * 2/n_cells of the corpus instead of all of it.
    *
    * Centroids are derived with EXACT integer arithmetic so the oracle
    * is bit-identical: each coordinate is floor-quantized to 2^20ths and
    * summed as longs (order-free, unlike float summation, whose
    * accumulation order differs across engines and would flip near-tied
    * cell rankings), then divided once — one deterministic double per
    * coordinate. Distance/cosine folds run in array order, the same
    * fold-order-parity the d7/d21 oracles already pin.
    *
    * SCALE: the centroid table is k rows (one tiny aggregate); the
    * per-query cell ranking is a k-row broadcast cross join; the probe
    * is a broadcast equi-join on the cell id — the corpus never
    * shuffles and is scanned once, exactly d7's shape with a 2-cell
    * probe set.
    */
  /** Exact-integer per-label centroid table — see [[d34AnnIvfProbes]]'s
    * scaladoc for why floor-quantized long sums (order-free) matter.
    * Returns (c_label, cv).
    */
  private def labelCentroidsExact(e: DataFrame): DataFrame = {
    val Scale = 1048576L // 2^20: exact floor-quantization denominator
    e.select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
      .withColumn("q", floor(col("x") * Scale).cast("long"))
      .groupBy(col("label"), col("i"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .withColumn("c", col("sq") / (col("n") * lit(Scale.toDouble)))
      .groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(i, c))), s -> s.c)").as("cv"))
      .select(col("label").as("c_label"), col("cv"))
  }

  /** Per-query top-`nprobe` cells by squared centroid distance (ties by
    * label): (q_id, qv, c_label), one row per probed cell.
    */
  private def probedCells(q: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    val cellRank = Window.partitionBy(col("q_id"))
      .orderBy(col("dist").asc, col("c_label").asc)
    q.crossJoin(broadcast(cents))
      .withColumn("dist", aggregate(zip_with(col("qv"), col("cv"),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
      .withColumn("crn", row_number().over(cellRank))
      .filter(col("crn") <= nprobe)
      .select(col("q_id"), col("qv"), col("c_label"))
  }

  def d34AnnIvfProbes(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val probes = probedCells(q, labelCentroidsExact(e), nprobe = 2)
    val scored = e.join(broadcast(probes),
        col("label") === col("c_label") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("qv"), col("v")).as("sim"))
    topK(scored)
  }

  /** IVF cell-probed ANN: each query searches only the corpus vectors in
    * its own coarse cell (`label`), then exact-rerank top-k. One equi-join
    * on the cell id — at 100 TB this is the difference between scanning
    * the corpus per query and scanning 1/n_cells of it.
    */
  def d7AnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("label").as("q_label"))
    val scored = e.join(broadcast(q),
        col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("qv"), col("v")).as("sim"))
    topK(scored)
  }

  private val KMedK = 8
  private val KMedIters = 2

  /** Nearest-centroid id as a pure per-row EXPRESSION over literal
    * centroids — no join, no shuffle: the corpus never moves during
    * assignment. `array_min` over `(d, cid)` structs orders by distance
    * then cid (= the oracle's `ORDER BY d, cid` tie-break); the inner
    * distance is a fixed-order sequential fold, bit-identical to the
    * oracle's list_sum comprehension.
    *
    * The k×dim centroid matrix enters as ONE `typedlit` literal (an
    * array<struct<cid, cv>> value), not a k×dim tree of per-coordinate
    * `lit` nodes: the earlier per-coordinate form built ~1000 Catalyst
    * nodes PER TRAINING ITERATION (each with fresh literal values, so
    * nothing caches across iterations), and driver-side
    * analysis/optimization of those trees — not executor compute and not
    * codegen (disabling wholestage codegen leaves the cold time
    * unchanged) — dominated d13's ~11 s first execution. One literal node
    * makes the tree size O(k) regardless of dim. Same struct-min
    * semantics, bit-identical assignments (d21's DuckDB oracle pins this:
    * it reproduces training through this expression hash-exactly).
    */
  /** The batch-trained coarse quantizer as a driver-side constant — the
    * exact-integer per-label centroid table of [[d34AnnIvfProbes]],
    * collected for reuse as a STATIC side in streaming ingest (s14): a
    * vector store's coarse quantizer is trained in batch and held fixed
    * while the stream assigns arrivals against it. k rows, one tiny
    * aggregate job.
    */
  def exactLabelCentroids(spark: SparkSession, sfDir: String): Seq[(Int, Seq[Double])] =
    TrainedModelCache.getOrTrain("label-centroids", sfDir)(
      labelCentroidsExact(embeddings(spark, sfDir)).collect().toSeq
        .map(r => (r.getInt(0), r.getSeq[Double](1))))

  /** Nearest-cell assignment over a literal centroid table as a pure
    * per-row expression (see [[nearestCidLit]]) — public surface for the
    * streaming ingest path; `vcol` must be `array<double>`.
    */
  def nearestCellExpr(centroids: Seq[(Int, Seq[Double])], vcol: Column): Column =
    nearestCidLit(centroids, vcol)

  /** `array<float>` -> `array<double>` cast used everywhere a raw
    * embeddings scan feeds double-exact vector math.
    */
  def vecAsDouble(c: Column): Column = asDouble(c)

  /** SemDeDup pair threshold: below d9's 0.45 tail cut because SemDeDup
    * prunes WITHIN clusters, where baseline similarity is already
    * elevated — 0.38 exercises the keep-rule on this corpus at every SF.
    */
  private[graft] val SemDedupThreshold = 0.38

  /** Semantic dedup, SemDeDup-style (Abbas et al. 2023, public): prune
    * near-duplicate EMBEDDINGS within each cluster of the corpus. Pairs
    * are compared only inside their coarse cell (here the label cell =
    * the d7/d34 IVF convention); a member is dropped when some same-cell
    * neighbor with cosine >= [[SemDedupThreshold]] precedes it under the
    * keep order (LOWER similarity-to-centroid first — SemDeDup keeps the
    * least-redundant member of a dup pair — vec_id breaking exact ties).
    * Output: every embedding with its cell, rounded centroid similarity,
    * and kept flag (1/0 — the kept set is the curated corpus).
    *
    * Exactness: centroids are d34's exact-integer table, so both the
    * centroid similarities and the pair similarities are bit-identical
    * doubles in every engine; the unrounded csim ordering the keep-rule
    * compares is therefore oracle-replayable (the d34 cell-ranking
    * precedent).
    *
    * SCALE: the quadratic term is confined to each cell — exactly the
    * SemDeDup design (cluster first so all-pairs is per-cluster) — as a
    * shuffle equi-join on the cell id: O(Σ cell²) compares spread over
    * cells × partitions tasks, no broadcast of the corpus, no global
    * all-pairs. Cell occupancy is the knob: at 100 TB the cell count
    * scales with corpus size (k-means cells via d13's trained quantizer
    * instead of the fixture labels), holding per-cell work constant.
    */
  def d46SemDedup(spark: SparkSession, sfDir: String): DataFrame =
    semDedupOver(embeddings(spark, sfDir))

  /** [[d46SemDedup]]'s core over any `(vec_id, v, label)` relation —
    * parameterized for the ScalaCheck property pin.
    */
  /** [[semDedupOver]]'s one live per-cell block cache (the grouped
    * block lists feed both replicated join sides —
    * [[ReplaceOnCallCache]] lifetime contract).
    */
  private val d46BlockCache = new ReplaceOnCallCache

  private[graft] def semDedupOver(e: DataFrame): DataFrame = {
    // widened: the per-cell quadratic cosine filter runs on the PROBE
    // side of a broadcast join, i.e. at raw scan parallelism — one
    // parquet row group pinned it to a single task before this
    // n2 (per-vector, linear) rides into the per-cell quadratic work so
    // the pair stage pays only the dot product — since r14 as whole
    // B x B tiles through the BlockPairsFx kernel (primitive arrays,
    // fast-dot screen, exact fold for survivors — emitted sims
    // bit-identical to the old cosineFromParts pair join). Cells block
    // into per-cell id-ordered tiles (the d58 decomposition), so
    // parallelism is cells x block-pairs and per-task memory one tile.
    val cs = CorpusOps.scanWide(e)
      .join(broadcast(labelCentroidsExact(e)), col("label") === col("c_label"))
      .select(col("vec_id"), col("label"), col("v"),
        cosine(col("v"), col("cv")).as("csim"),
        sumSq(col("v")).as("n2"))
    val idxW = Window.partitionBy(col("label")).orderBy(col("vec_id"))
    // csim rides the tiles as the kernel's aux payload, so the keep-rule
    // needs no join back to the corpus
    val item = struct(col("vec_id").as("id"), col("v"), col("n2"),
      col("csim").as("aux"))
    val blocks = d46BlockCache.register(cs
      .withColumn("blk", floor((row_number().over(idxW) - 1) / BlockSize))
      .select(col("label"), col("blk"), item.as("it"))
      .groupBy(col("label"), col("blk")).agg(collect_list(col("it")).as("items")))
    // per-cell block counts from the CACHED grouped tiles (O(cells ×
    // blocks) rows, broadcast back): max block index + 1 == ceil(m/B).
    // r15: this read cs — a second full corpus scan plus a second
    // centroid-join — for a number the cache already determines (the
    // d58 form); the final keep join below stops re-deriving cs too,
    // so the whole operator reads the embedding table ONCE (plus the
    // centroid training aggregate), down from three times.
    val nb = blocks.groupBy(col("label")).agg((max(col("blk")) + 1).as("nb"))
    val withNb = blocks.join(broadcast(nb), Seq("label"))
    val lo = withNb.select(col("label"), col("blk").as("lo"),
      explode(sequence(col("blk"), col("nb") - 1)).as("hi"), col("items").as("as_"))
    val hi = withNb.select(col("label"),
      explode(sequence(lit(0L), col("blk"))).as("lo"), col("blk").as("hi"),
      col("items").as("bs_"))
    val pairs = lo.hint("shuffle_hash").join(hi, Seq("label", "lo", "hi"))
      .select(explode(graft.functions.BlockPairsFx.pairsAboveFx(
        col("as_"), col("bs_"), col("lo") === col("hi"), SemDedupThreshold)).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        col("p.a_aux").as("ca"), col("p.b_aux").as("cb"))
    // of each qualifying unordered pair, the member LATER in the keep
    // order (higher csim, ties higher id — SemDeDup keeps the
    // least-redundant member) is the dropped one: exactly the old
    // exists-a-preceding-partner predicate, pair by pair
    val dropped = pairs.select(
        when(col("ca") > col("cb") ||
          (col("ca") === col("cb") && col("a_id") > col("b_id")),
          col("a_id")).otherwise(col("b_id")).as("a_id"))
      .distinct()
    // membership/csim come back OUT of the cached tiles (every vector
    // lives in exactly one (label, blk) group; csim rode in as aux), so
    // the keep join reads no base relation at all
    val members = blocks.select(col("label"), explode(col("items")).as("it"))
      .select(col("it.id").as("vec_id"), col("label"), col("it.aux").as("csim"))
    members.join(dropped, col("vec_id") === col("a_id"), "left")
      .select(col("vec_id"), col("label").cast("long").as("cell"),
        round(col("csim"), 6).as("cent_sim"),
        when(col("a_id").isNull, lit(1L)).otherwise(lit(0L)).as("kept"))
  }

  /** d55: D4-STYLE SELECTION (Tirumala et al. 2023 — "Improving LLM
    * Pretraining via Document De-Duplication and Diversification"):
    * SemDeDup first ([[d46SemDedup]]'s keep set, composed VERBATIM),
    * then SSL-PROTOTYPES pruning over the survivors — in every cell,
    * DROP the most prototypical quarter (highest centroid similarity:
    * near-centroid points are the cluster's redundant "prototypes";
    * what remains is the diverse tail that adds information). Output:
    * the selected vectors `(vec_id, cell, cent_sim, prot_rk)` with
    * their within-cell prototype rank (rank 1 = most prototypical,
    * selected iff rank > n_cell div 4).
    *
    * ENGINE-EXACT: ranking is on d46's 6-dp-rounded centroid
    * similarity (centroids are the exact-integer table, so the rounded
    * value is bit-identical on both engines) with vec_id tiebreak; the
    * drop count is integer division. The oracle replays both stages.
    *
    * SCALE: the expensive stage is d46's per-cell quadratic join (its
    * own documented bound); everything added here is O(survivors) —
    * the within-cell rank runs through the shared `bucketRank`
    * decomposition (cells × 33 similarity buckets of parallelism, no
    * per-cell global window), the per-cell counts are an O(cells)
    * broadcast. The survivor projection is persisted: rank offsets and
    * the count join both consume it (the d13 pattern — re-deriving it
    * would re-run the SemDeDup join).
    */
  def d55D4Select(spark: SparkSession, sfDir: String): DataFrame =
    d4SelectOver(embeddings(spark, sfDir))

  /** Neighbors per vector in [[d58KnnGraph]]. */
  private val KnnGraphK = 3

  /** [[d58KnnGraph]]'s one live grouped-tile cache
    * ([[ReplaceOnCallCache]] lifetime contract).
    */
  private val d58BlockCache = new ReplaceOnCallCache

  /** d58: the k-NN GRAPH — every vector's top-[[KnnGraphK]] cosine
    * neighbors within its coarse cell, the primitive under graph-based
    * curation (SemDeDup/D4 derive from it in practice, connected-
    * component semantic clusters run on it, and an HNSW-style index
    * bootstraps from it). Unlike d7 (bounded query set) the query side
    * here IS the corpus, so the work is inherently per-cell quadratic —
    * the honest part — and the design question is parallelism:
    *
    * SCALE: the candidate join composes the d7 cell confinement with
    * d9's BLOCK decomposition — sides replicate to (label, lo, hi)
    * block-pair keys and meet in a shuffle hash equi-join, so
    * parallelism is cells × block-pairs (NOT the cell count, which
    * would cap a 1000-executor cluster at n_cells tasks), per-task
    * memory O(2·B·dim). Blocks are numbered PER CELL (one
    * label-partitioned row index — O(cell) rows per window task), so a
    * vector replicates only its own cell's block count: shuffle volume
    * is Σ_cell m·ceil(m/B), the true block-pair work, where a global
    * vec_id-derived block index replicated every vector nBlocks+1 times
    * corpus-wide regardless of its cell's occupancy. idx order = vec_id
    * order within the cell, so the a_id < b_id dedup keeps exactly one
    * orientation per pair, as before. Each undirected block pair is
    * scored once and emitted in both directions (a mirror projection,
    * not a second join); per-vector top-k is one q_id window whose rank
    * filter group-limits BEFORE the shuffle (WindowGroupLimit,
    * plan-pinned).
    */
  def d58KnnGraph(spark: SparkSession, sfDir: String): DataFrame = {
    val idxW = Window.partitionBy(col("label")).orderBy(col("vec_id"))
    // n2 rides the block replication (the d9 decomposed-cosine move);
    // since r14 each (label, lo, hi) tile is scored by ONE
    // BlockPairsFx.topK kernel call from primitive arrays, which emits
    // only each side's TILE-LOCAL top-k (fast-dot shortlist, exact
    // in-order rescore — sims bit-identical to the old per-pair form).
    // The union of tile-local top-k lists provably contains every
    // vector's global top-k under the same (sim desc, n_id asc)
    // comparator, so the q_id window sees 2·B·k rows per tile instead
    // of B² — the stage that used to shuffle the full quadratic pair
    // stream into the window sort now shuffles O(N·k·blocks-per-cell).
    val e = embeddings(spark, sfDir)
      .withColumn("blk", floor((row_number().over(idxW) - 1) / BlockSize))
      .withColumn("n2", sumSq(col("v")))
    val item = struct(col("vec_id").as("id"), col("v"), col("n2"), lit(0.0).as("aux"))
    // persisted: the grouped tiles feed both replicated join sides and
    // the block-count aggregate (ReplaceOnCallCache lifetime contract —
    // the returned frame reads it at the caller's action)
    val blocks = d58BlockCache.register(
      e.select(col("label"), col("blk"), item.as("it"))
        .groupBy(col("label"), col("blk")).agg(collect_list(col("it")).as("items")))
    // per-cell block counts: O(cells) rows, broadcast back
    val nb = blocks.groupBy(col("label")).agg((max(col("blk")) + 1).as("nb"))
    val withNb = blocks.join(broadcast(nb), Seq("label"))
    val lo = withNb.select(col("label"), col("blk").as("lo"),
      explode(sequence(col("blk"), col("nb") - 1)).as("hi"), col("items").as("as_"))
    val hi = withNb.select(col("label"),
      explode(sequence(lit(0L), col("blk"))).as("lo"), col("blk").as("hi"),
      col("items").as("bs_"))
    val directed = lo.hint("shuffle_hash").join(hi, Seq("label", "lo", "hi"))
      .select(explode(graft.functions.BlockPairsFx.blockTopKFx(
        col("as_"), col("bs_"), col("lo") === col("hi"), KnnGraphK)).as("p"))
      .select(col("p.q_id").as("q_id"), col("p.n_id").as("n_id"), col("p.sim").as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    directed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KnnGraphK)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"), col("rn"))
  }

  /** Edge threshold for [[d60SemanticClusters]]: looser than the 0.38
    * dedup level BY DESIGN — clustering groups related documents;
    * dedup kills near-copies. At 0.3 the kNN graph keeps its strong
    * edges (~15% of them on this corpus) without fusing everything.
    */
  private val ClusterTau = 0.3

  /** d60: SEMANTIC CLUSTERS — connected components over the
    * [[d58KnnGraph]] edges at ≥ [[ClusterTau]] (d25's move applied to
    * the kNN graph): every vector in a strong-edge component gets its
    * component's smallest vec_id as cluster label, plus the cluster
    * size. This is the topic-clustering step cluster-balanced sampling
    * and per-cluster curation start from.
    *
    * SCALE: edges are the already-thinned kNN top-k (O(k·N), not the
    * quadratic candidate set), symmetrized and thresholded on the 6-dp
    * similarity both engines agree on; components run GraphOps'
    * checkpointed min-label propagation (O(log n) rounds — the
    * d25/d51 machinery verbatim); the size window partitions by
    * cluster over O(involved vectors) rows.
    */
  /** [[d60SemanticClusters]]' one live edge cache (see
    * [[ReplaceOnCallCache]] — the returned clustering references it
    * lazily, so the op can't unpersist before the caller's action).
    */
  private val d60EdgeCache = new ReplaceOnCallCache

  def d60SemanticClusters(spark: SparkSession, sfDir: String): DataFrame = {
    // persist: the symmetrization inside connectedComponents references
    // the edge relation twice (union with its mirror), and the kNN
    // subplan behind it is the expensive part (the d13 pattern);
    // replace-on-next-call bounds a long session to one live cache
    val edges = d60EdgeCache.register(d58KnnGraph(spark, sfDir)
      .filter(col("sim") >= ClusterTau)
      .select(least(col("q_id"), col("n_id")).as("a"),
        greatest(col("q_id"), col("n_id")).as("b"))
      .distinct())
    val w = Window.partitionBy(col("cluster_id"))
    GraphOps.connectedComponents(edges)
      .select(col("id").as("vec_id"), col("label").as("cluster_id"))
      .select(col("vec_id"), col("cluster_id"),
        count(lit(1)).over(w).cast("long").as("cluster_size"))
  }

  /** Per-cluster representative budget for [[d68ClusterCap]]. Two keeps
    * a diversity witness pair per near-dup group; the production knob
    * scales with how aggressively the mix prunes redundancy.
    */
  private val ClusterCapN = 2L

  /** Diversity-CAPPED cluster sampling — the pruning step SemDeDup-style
    * pipelines run AFTER clustering (Abbas et al. 2023 keep one point
    * per duplicate cluster; D4 prunes prototypes): every [[d60SemanticClusters]]
    * cluster keeps at most [[ClusterCapN]] representatives, chosen by a
    * seeded per-vector hash draw so the keep set is unbiased w.r.t.
    * ingest order and stable under retry (d22's discipline, ":cap"
    * salt decorrelated from every other draw). Every member row is
    * emitted with its keep rank and a `kept` flag — a downstream mix
    * joins `kept = 1`; singletons never enter d60's edge set and need
    * no cap.
    *
    * SCALE: one window over the O(clustered vectors) cluster relation,
    * partitioned by cluster_id — near-dup clusters are small by
    * construction (d60's similarity threshold), so no partition
    * outgrows its executor; everything upstream is d60's plan verbatim
    * (shared in-session via its replace-on-call edge cache).
    */
  def d68ClusterCap(spark: SparkSession, sfDir: String): DataFrame = {
    val draw = graft.functions.Md5Slices60.md5Prefix60(
      concat(col("vec_id").cast("string"), lit(":cap")))
    val w = Window.partitionBy(col("cluster_id")).orderBy(col("draw"), col("vec_id"))
    d60SemanticClusters(spark, sfDir)
      .withColumn("draw", draw)
      .withColumn("keep_rk", row_number().over(w).cast("long"))
      .select(col("vec_id"), col("cluster_id"), col("cluster_size"), col("keep_rk"),
        when(col("keep_rk") <= ClusterCapN, lit(1L)).otherwise(lit(0L)).as("kept"))
  }

  /** d56: SEMANTIC CONTAMINATION audit — the embedding-space analog of
    * d20's n-gram collision check: an evaluation example whose EMBEDDING
    * sits near a training vector measures memorized semantics even when
    * no 8-gram matches (paraphrased eval sets, translated benchmarks —
    * exactly what n-gram decontamination provably misses). Eval slice =
    * `vec_id % 25 == 0` (the held-out 4%); emit every (eval, train) pair
    * with cosine ≥ 0.38 (the SemDeDup near-dup level) and the 6-dp
    * similarity.
    *
    * DESIGN CHOICE, measured: cell-probed pruning (the d34 coarse probe)
    * reaches only 10/14 of the true ≥0.38 pairs on this corpus at
    * nprobe = 3 — and a contamination AUDIT is exactly where silent
    * recall loss is unacceptable. Because the eval side is tiny, the
    * exact form IS the scalable form: broadcast the eval vectors and
    * scan the corpus ONCE with a codegen'd cosine against each — d6's
    * BroadcastNestedLoopJoin shape, zero corpus shuffle, zero recall
    * loss. (Probing is the right trade when the query side is
    * corpus-sized — that is d34/d36's territory.)
    *
    * SCALE: one corpus scan × |eval| dot products per row; at 100 TB
    * with a 10k-example eval suite this is scan-bound with a ~10k-row
    * broadcast — the same shape the d20 gram audit ships. The ≥ τ
    * filter runs on the unrounded similarity inside the scan, so only
    * contaminated pairs ever leave an executor.
    */
  def d56SemanticContamination(spark: SparkSession, sfDir: String): DataFrame =
    semanticContaminationOver(embeddings(spark, sfDir))

  /** [[d56SemanticContamination]]'s core over any `(vec_id, v)` relation
    * — parameterized for the planted-contamination spec.
    */
  private[graft] def semanticContaminationOver(e: DataFrame): DataFrame = {
    val ev = e.filter(pmod(col("vec_id"), lit(25L)) === 0L)
      .select(col("vec_id").as("eval_id"), col("v").as("evv"))
    e.filter(pmod(col("vec_id"), lit(25L)) =!= 0L)
      .crossJoin(broadcast(ev))
      .withColumn("sim", cosine(col("evv"), col("v")))
      .filter(col("sim") >= SemDedupThreshold)
      .select(col("eval_id"), col("vec_id").as("train_id"),
        round(col("sim"), 6).as("sim"))
  }

  /** [[d4SelectOver]]'s one live survivor cache ([[ReplaceOnCallCache]]
    * lifetime contract).
    */
  private val d55KeptCache = new ReplaceOnCallCache

  /** [[d55D4Select]]'s core over any `(vec_id, v, label)` relation —
    * parameterized for the in-memory-replay spec.
    */
  private[graft] def d4SelectOver(e: DataFrame): DataFrame = {
    val kept = d55KeptCache.register(semDedupOver(e).filter(col("kept") === 1L)
      .select(col("vec_id"), col("cell"), col("cent_sim"))
      // bucket: monotone non-increasing in cent_sim (a pure function of
      // it, so ties stay in one bucket) — 33 buckets over [-1, 1]
      .withColumn("b",
        expr("(1000000L - cast(cent_sim * 1000000.0 as bigint)) div 62500")))
    // r15: per-cell totals ride bucketRank's own offsets aggregation
    // (withTotal) — the previous separate count aggregation + broadcast
    // join cost two more jobs per run for numbers the offsets shuffle
    // already held
    CorpusOps.bucketRank(kept, Seq("cell"),
        Seq(col("cent_sim").desc, col("vec_id")), withTotal = true)
      .filter(col("rk") > expr("tot div 4"))
      .select(col("vec_id"), col("cell"), col("cent_sim"), col("rk").as("prot_rk"))
  }

  /** Nearest-centroid argmin over a literal centroid table. Since r16
    * this is the native fused-loop kernel
    * ([[graft.functions.PqArgmin.nearestCell]]) — the composed
    * `array_min(transform(typedlit(...), struct(aggregate(zip_with(...)))))`
    * form it replaces is `CodegenFallback` end to end (per-row boxed
    * lambda dispatch over k×dim), bit-identical semantics pinned by
    * PqArgminSpec (sequential accumulation, ties to the lowest cid).
    */
  private def nearestCidLit(centroids: Seq[(Int, Seq[Double])], vcol: Column = col("v")): Column =
    graft.functions.PqArgmin.nearestCell(centroids, vcol)

  // PQ geometry: dim 64 = 8 subspaces x 8 dims, 16 codes per subspace
  // (one byte of code space per pair of subspaces — a 64-dim vector
  // compresses to 8 4-bit codes), 50 ADC candidates before exact rerank
  private val PqM = 8
  private val PqSubDim = 8
  private val PqK = 16
  private val PqCand = 50

  /** d35: IVF-PQ — PRODUCT-QUANTIZED ANN, the storage-side half of the
    * standard 100 TB vector-search layout (IVF prunes which vectors to
    * score — d7/d13/d34; PQ compresses HOW each is scored). Each vector
    * splits into [[PqM]] subvectors; a per-subspace codebook ([[PqK]]
    * centroids, sample-trained Lloyd's with k-medians updates — see
    * [[pqCodebooks]]) encodes the corpus as [[PqM]] small codes.
    * Search is ASYMMETRIC DISTANCE (ADC): per query, one [[PqM]]×[[PqK]]
    * table of exact subvector-to-centroid distances is precomputed, and
    * a corpus vector's approximate distance is just [[PqM]] table
    * lookups summed — no per-pair float math over the raw dims. The top
    * [[PqCand]] ADC candidates per query are then EXACT-reranked by
    * cosine to the final top-k (the standard ADC + rerank pipeline).
    *
    * SCALE: this is the operator that makes 100 TB ANN feasible at all —
    * the scored representation is 8 codes/vector (vs 512 bytes of raw
    * doubles, a 64× read-volume cut), the codebooks are
    * [[PqM]]×[[PqK]]×[[PqSubDim]] literals folded into the encode
    * expression (tree O(M·K), zero shuffle, corpus scanned in place),
    * and the query tables are a 20-row broadcast. Exact rerank touches
    * only O(queries × PqCand) raw vectors.
    *
    * Oracle-checked end to end (the ADVICE r9 gap): the k-MEDIANS
    * codebook update makes training order-independent, so the DuckDB
    * oracle replays all [[PqM]]×3 trainings, the encoding, the ADC
    * ranking and the exact rerank hash-exactly (d21's
    * iterative-oracle precedent, lifted to the subspace grid).
    * VectorOpsSpec additionally pins ADC-candidate recall against
    * brute force, rerank exactness, and determinism.
    */
  /** All [[PqM]] per-subspace codebooks trained TOGETHER: the naive form
    * (one [[kmeansCentroids]] loop per subspace) runs M×iters tiny jobs
    * whose scheduling overhead dominates at any data size — 8 subspaces
    * are not 8 sequential trainings, they are one training over rows
    * tagged with their subspace. Each iteration is ONE job: explode the
    * sample into (m, subvector) rows, assign every row with a single
    * m-dispatched literal-codebook argmin projection (a `when` chain
    * over the M codebooks — all literals, zero shuffle), update every
    * (m, cid, dim) centroid in one aggregation. Seeds = the [[PqK]]
    * lowest sample vec_ids, sliced per subspace (identical to what the
    * per-subspace loops would seed).
    *
    * The centroid update is the component-wise MEDIAN rounded to 6 dp
    * (k-medians, [[medianCentroids]]'s d21 trick), not the mean: median
    * is selection-based and therefore order-independent, which is what
    * lets the DuckDB oracle replay all [[PqM]]×iters trainings
    * hash-exactly — a float mean's accumulation order cannot be pinned
    * across engines (d13's k-means stays rows-only for exactly that
    * reason). Same plan shape and cost as the mean form: one explode +
    * one two-level aggregation per iteration.
    */
  private def pqCodebooks(sample: DataFrame, iters: Int): Seq[Seq[(Int, Seq[Double])]] = {
    // persisted: every iteration re-reads the exploded sample (and d43's
    // sample is itself a residual projection over a join) — without the
    // cache, `iters` trainings scan and re-residualize the sample
    // `iters` times instead of once. Tiny: the 1-in-4 sample × M rows.
    val subRows = sample.select(col("vec_id"), posexplode(
      array((0 until PqM).map(m => slice(col("v"), m * PqSubDim + 1, PqSubDim)): _*))
      .as(Seq("m", "sv"))).persist()
    var books: Seq[Seq[(Int, Seq[Double])]] = {
      val seeds = sample.orderBy(col("vec_id")).limit(PqK)
        .select(col("v")).collect().map(_.getSeq[Double](0))
      (0 until PqM).map(m => seeds.toSeq.zipWithIndex.map { case (v, i) =>
        (i, v.slice(m * PqSubDim, (m + 1) * PqSubDim)) })
    }
    for (_ <- 0 until iters) {
      // one m-dispatched native argmin instead of a when-chain of M
      // interpreted argmins (same dispatch, kernel per branch)
      val cidExpr = graft.functions.PqArgmin.subCid(books, PqSubDim, col("m"), col("sv"))
      val updated = subRows.withColumn("cid", cidExpr)
        .select(col("m"), col("cid"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy(col("m"), col("cid"), col("dim"))
        .agg(round(percentile(col("x"), lit(0.5)), 6).as("c"))
        .groupBy(col("m"), col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, c))), s -> s.c)").as("cv"))
        .collect()
        .groupBy(_.getInt(0))
      books = (0 until PqM).map(m => updated.getOrElse(m, Array.empty).toSeq
        .map(r => (r.getInt(1), r.getSeq[Double](2))))
    }
    subRows.unpersist(blocking = false)
    books
  }


  /** Bounded ADC candidate selection + exact rerank shared by the PQ
    * family (d35/d36/d43): the PqCand best (adc, vec_id) per query via
    * ONE map-side-combined [[graft.functions.BottomKPairs]] aggregate
    * over order-preserving double bits — identical selection to the
    * row_number window it replaced (k smallest by (adc, vec_id);
    * vec_ids are distinct per query so pair-set selection = row
    * selection), WITHOUT shuffling the corpus-x-probes scored stream:
    * each task keeps at most queries x PqCand pairs and only those
    * partials shuffle. Raw vectors for the exact rerank come from a
    * second PRUNED corpus scan broadcast-joined against the tiny
    * candidate list (queries x PqCand rows) — at scale a 2-column
    * rescan beats shuffling the scored stream by the probe fan-out.
    */
  private def adcTopCandidates(adc: DataFrame, e: DataFrame, qv: DataFrame): DataFrame = {
    val sel = adc.groupBy(col("q_id"))
      .agg(graft.functions.BottomKPairs.bottomKPairs(
        graft.functions.DoubleOrderBits.bits(col("adc")), col("vec_id"), PqCand).as("bk"))
      .select(col("q_id"), explode(expr("transform(bk, p -> p.v)")).as("n_id"))
    topK(e.select(col("vec_id").as("n_id"), col("v"))
      .join(broadcast(sel), "n_id")
      .join(broadcast(qv), "q_id")
      .select(col("q_id"), col("n_id"), cosine(col("qv"), col("v")).as("sim")))
  }

  def d35AnnIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = embeddings(spark, sfDir)
    // per-subspace codebooks, trained on the deterministic 1-in-4 id sample
    val codebooks = trainedPqCodebooks(spark, sfDir)
    // encode: 8 zero-shuffle literal-codebook argmins per row (scan
    // widened: the per-row argmin chain is the cost, not IO)
    val encoded = CorpusOps.scanWide(e).select(col("vec_id"), col("v"),
      graft.functions.PqArgmin.pqCodes(codebooks, PqSubDim, col("v")).as("codes"))
    // per-query ADC tables: M x K exact subvector distances, driver-built
    // from the k x dim codebooks (tiny) and broadcast with the queries
    val qDf = pqQueryTables(spark, e, codebooks)
    val adc = encoded.join(broadcast(qDf), col("vec_id") =!= col("q_id"))
      .withColumn("adc", adcScore)
    adcTopCandidates(adc, e, qDf.select(col("q_id"), col("qv")))
  }

  /** The broadcastable query side of ADC search: (q_id, qv, tabs) where
    * `tabs[m][k+1]` is the exact squared distance from the query's m-th
    * subvector to codebook m's centroid with cid=k. The table is DENSE in
    * cid (positions for cids a collapsed-empty cluster dropped hold
    * +Infinity): [[adcScore]]'s `element_at(t, c + 1)` lookup is
    * positional, and a sparse sorted-by-cid list would silently misalign
    * every code above the first gap. Infinity is safe — the encoder can
    * never emit a dropped cid.
    */
  private def pqQueryTables(spark: SparkSession, e: DataFrame,
      codebooks: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    import spark.implicits._
    e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .map { case (qid, qv) =>
        val tabs = codebooks.zipWithIndex.map { case (cb, m) =>
          val sub = qv.slice(m * PqSubDim, (m + 1) * PqSubDim)
          val byCid = cb.map { case (cid, cv) =>
            cid -> sub.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
          }.toMap
          (0 until PqK).map(k => byCid.getOrElse(k, Double.PositiveInfinity))
        }
        (qid, qv, tabs)
      }.toDF("q_id", "qv", "tabs")
  }

  /** ADC score: sum of M table lookups, one per code — the native fused
    * loop ([[graft.functions.PqArgmin.adcScore]]); the composed
    * `aggregate(zip_with(..., element_at))` form it replaces was the PQ
    * family's dominant interpreted term (it runs per corpus×probe joined
    * row, not per corpus row). Parity pinned in PqArgminSpec.
    */
  private def adcScore: Column =
    graft.functions.PqArgmin.adcScore(col("codes"), col("tabs"))

  /** d36: the FULL IVF-PQ pipeline — both halves of the 100 TB layout
    * composed: the coarse quantizer prunes WHICH vectors are scored
    * (d34's exact-integer cell ranking, `nprobe` = 3 — one more probe
    * than d34 because PQ's own loss compounds with cell-pruning loss;
    * nprobe is THE recall/cost dial of a deployed IVF index) and PQ compresses
    * HOW the survivors are scored (d35's codebooks + ADC lookups), with
    * exact rerank of the top [[PqCand]] candidates. Per query the scored
    * set is 2/n_cells of the corpus AND each scored row costs [[PqM]]
    * lookups instead of raw-dim math — the multiplicative read/compute
    * cut that makes web-scale vector search run. (This variant
    * quantizes raw vectors; [[d43AnnIvfPqResidual]] is the
    * residual-refined form — same plan shape, tighter codes.)
    *
    * Oracle-checked end to end like d35: median-update training + the
    * exact-integer coarse centroids (d34) make every stage of the
    * composed pipeline replayable in DuckDB hash-exactly.
    * VectorOpsSpec additionally pins cell containment, rerank exactness
    * and recall vs brute force.
    */
  def d36AnnIvfPqFull(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embeddings(spark, sfDir)
    val codebooks = trainedPqCodebooks(spark, sfDir)
    val encoded = CorpusOps.scanWide(e).select(col("vec_id"), col("v"), col("label"),
      graft.functions.PqArgmin.pqCodes(codebooks, PqSubDim, col("v")).as("codes"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val probes = probedCells(q, labelCentroidsExact(e), nprobe = 3)
      .drop("qv") // tabs + qv travel with the ADC query side below
    val qDf = pqQueryTables(spark, e, codebooks)
    val probeSide = probes.join(qDf, "q_id") // (q_id, c_label, qv, tabs): 2 rows/query
    val adc = encoded.join(broadcast(probeSide),
        col("label") === col("c_label") && col("vec_id") =!= col("q_id"))
      .withColumn("adc", adcScore)
    adcTopCandidates(adc, e, q.select(col("q_id"), col("qv")))
  }

  /** d43: RESIDUAL IVF-PQ — the refinement d36's doc promised: PQ
    * codebooks train on and encode `v − centroid(cell(v))` instead of
    * raw vectors. After coarse assignment, residuals from every cell
    * live near the origin in a shared, tighter distribution, so the
    * same 8×16-code budget spends its resolution on the part of the
    * vector the coarse quantizer did NOT explain — this is the form
    * production IVF-PQ indexes actually deploy. The search-side
    * consequence: a query's ADC table now depends on WHICH probed cell
    * is being scanned (the query residual differs per cell), so the
    * broadcast query side carries one (q_id, c_label, tabs) row per
    * probe — still O(queries × nprobe) tiny rows. Plan shape is
    * IDENTICAL to d36 (coarse prune → per-cell ADC → exact rerank);
    * only the table contents change.
    *
    * Oracle-checked end to end like d35/d36: residual subtraction is
    * elementwise (order-free), the coarse centroids are d34's
    * exact-integer table, and training uses the k-medians update — the
    * DuckDB oracle replays residualization, training, encode, per-cell
    * ADC and rerank hash-exactly.
    */
  def d43AnnIvfPqResidual(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = embeddings(spark, sfDir)
    val cents = exactLabelCentroids(spark, sfDir)
    val cmap = typedlit(cents.toMap)
    def resid = zip_with(col("v"), element_at(cmap, col("label")), (a, b) => a - b)
    // residual codebooks train once per corpus snapshot — 3 k-medians
    // iterations over the quarter-corpus residual sample, re-paid per
    // run before the cache (at 16x the training owned d43's wall)
    val codebooks = TrainedModelCache.getOrTrain("pq-residual", sfDir)(
      pqCodebooks(e.filter(pmod(col("vec_id"), lit(4)) === 0)
        .select(col("vec_id"), resid.as("v")), iters = 3))
    // one kernel call over the residual: the residual projection itself
    // now evaluates ONCE per row (the per-subspace slice form re-derived
    // it M times)
    val encoded = CorpusOps.scanWide(e).select(col("vec_id"), col("v"), col("label"),
      graft.functions.PqArgmin.pqCodes(codebooks, PqSubDim, resid).as("codes"))
    // driver-built probe side: per query, the nprobe=3 nearest cells by
    // squared centroid distance (ties by label — probedCells' ordering),
    // each carrying the PER-CELL residual ADC table. Arithmetic mirrors
    // the oracle exactly: sequential folds, dense-in-cid tables.
    val qs = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val probeRows = qs.flatMap { case (qid, qv) =>
      cents.map { case (lbl, cv) =>
        (qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, lbl, cv)
      }.sortBy(t => (t._1, t._2)).take(ResidProbes).map { case (_, lbl, cv) =>
        val qres = qv.zip(cv).map { case (a, b) => a - b }
        val tabs = codebooks.zipWithIndex.map { case (cb, m) =>
          val sub = qres.slice(m * PqSubDim, (m + 1) * PqSubDim)
          val byCid = cb.map { case (cid, c) =>
            cid -> sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          }.toMap
          (0 until PqK).map(k => byCid.getOrElse(k, Double.PositiveInfinity))
        }
        (qid, lbl, qv, tabs)
      }
    }
    val probeSide = probeRows.toDF("q_id", "c_label", "qv", "tabs")
    val adc = encoded.join(broadcast(probeSide),
        col("label") === col("c_label") && col("vec_id") =!= col("q_id"))
      .withColumn("adc", adcScore)
    adcTopCandidates(adc, e, qs.toDF("q_id", "qv"))
  }

  /** Probed cells per query in [[d43AnnIvfPqResidual]] (nprobe). */
  private[graft] val ResidProbes = 3

  /** d35's batch-trained PQ codebooks as a driver-side constant — the
    * PQ half of [[exactLabelCentroids]]'s contract: a deployed vector
    * index trains its quantizers in batch and holds them FIXED while
    * ingest encodes arrivals (s15). Deterministic (k-medians updates),
    * so batch and streaming sessions derive identical codebooks.
    */
  def trainedPqCodebooks(spark: SparkSession, sfDir: String): Seq[Seq[(Int, Seq[Double])]] =
    TrainedModelCache.getOrTrain("pq-raw", sfDir)(
      pqCodebooks(embeddings(spark, sfDir)
        .filter(pmod(col("vec_id"), lit(4)) === 0), iters = 3))

  /** The [[PqM]] PQ codes of `vcol` packed into ONE long — 4 bits per
    * code (PqK = 16), code m at bit 4m: a zero-shuffle per-row
    * expression whose integer SUM is an order-free aggregate
    * fingerprint of WHICH codes a cell's members carry (the s15 gate
    * column). Literal codebooks, same argmin as the d35 encoder.
    */
  def pqCodeKeyExpr(codebooks: Seq[Seq[(Int, Seq[Double])]], vcol: Column): Column =
    graft.functions.PqArgmin.packedCodeKey(codebooks, PqSubDim, vcol)

  /** Component-wise MEDIAN centroid update. Median is selection-based —
    * order-INDEPENDENT, unlike avg's float accumulation — which is what
    * makes a trained quantizer oracle-reproducible at all (the one thing
    * d13's k-means cannot be). Rounded to 6 dp on both sides so the
    * engines' identical `lower + (upper-lower)*0.5` interpolation can
    * never diverge downstream. Driver collect is bounded by k x dim.
    * At 100 TB swap `percentile` for `approx_percentile` (same note as
    * q_percentiles); the exact form buffers one cell-dimension's values.
    */
  private def medianCentroids(assigned: DataFrame): Seq[(Int, Seq[Double])] =
    assigned.select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cid"), col("dim"))
      .agg(round(percentile(col("x"), lit(0.5)), 6).as("m"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").as("cv"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getSeq[Double](1)))

  /** IVF ANN over a k-MEDIANS-trained coarse quantizer — the fully
    * oracle-checked trained-quantizer path (d13's k-means twin). Seeds =
    * the [[KMedK]] smallest vec_ids; [[KMedIters]] Lloyd iterations with
    * median updates; every assignment is a zero-shuffle literal
    * projection; search is [[annIvfOverCells]]'s cell-probed exact
    * re-rank. Every arithmetic step is order-independent or fixed-order,
    * so the DuckDB oracle reproduces training AND search hash-exactly.
    */
  def d21AnnIvfKmedians(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embeddings(spark, sfDir).select(col("vec_id"), col("v"))
    // k-medians training is deterministic (selection-based updates), so
    // the coarse quantizer trains once per corpus snapshot
    val cents = TrainedModelCache.getOrTrain("kmed-coarse", sfDir) {
      val seeds = e.filter(col("vec_id") < KMedK).orderBy(col("vec_id"))
        .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1))).toSeq
      var cs = seeds
      for (_ <- 0 until KMedIters)
        cs = medianCentroids(e.withColumn("cid", nearestCidLit(cs)))
      cs
    }
    annIvfOverCells(e.withColumn("cid", nearestCidLit(cents)))
  }

  /** Symmetric per-vector int8 quantization audit: scale = max|v_i|/127,
    * q_i = clamp(floor(v_i/scale + 0.5), ±127), reporting the
    * reconstruction error — the storage-side step that cuts an embedding
    * table 4× (plus the scale column) before it is written at corpus
    * scale. `floor(x + 0.5)` rather than round(): float round-half
    * behavior is engine-discretionary, floor is IEEE-exact everywhere.
    *
    * SCALE: a pure per-row projection — zero shuffle; max/abs are
    * order-independent, so the audit is oracle-exact.
    */
  def d24EmbedQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embeddings(spark, sfDir).select(col("vec_id"), col("v"))
    val quant = e
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))) / lit(127.0))
      .withColumn("qv",
        when(col("scale") === 0, transform(col("v"), _ => lit(0.0)))
          .otherwise(transform(col("v"), x =>
            greatest(lit(-127.0), least(lit(127.0), floor(x / col("scale") + 0.5))))))
    // max_err must see the UNROUNDED scale: aliasing `round(scale, 6) AS
    // scale` in the same select would SHADOW the input column for later
    // projection entries (Spark 4 lateral column aliases resolve in list
    // order), silently quantizing against the rounded scale.
    quant
      .withColumn("max_err", round(array_max(zip_with(col("v"), col("qv"),
        (a, q) => abs(a - q * col("scale")))), 6))
      .select(
        col("vec_id"),
        round(col("scale"), 6).as("scale"),
        size(col("v")).cast("long").as("n_dims"),
        col("max_err"),
        size(filter(col("qv"), q => abs(q) === 127.0)).cast("long").as("n_saturated"))
  }
}
