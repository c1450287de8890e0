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
  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosineSim(a, b)

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

  /** Block edge length for the d9 blocked self-join. Per-task memory is
    * O(2·B·dim); B is small here so the fixture corpora exercise several
    * block pairs — at 100 TB you size B so one block pair (~2·B·dim·8
    * bytes of vectors) fits an executor core's working set.
    */
  private val BlockSize = 256L

  /** Embedding-cosine near-duplicate pairs: exact all-pairs self-similarity
    * at a threshold. Exact low-threshold pair search is inherently
    * quadratic — no LSH family guarantees recall at moderate thresholds —
    * so the honest scale story is a BLOCKED exact self-join: vectors are
    * tiled into blocks of [[BlockSize]] by id, each side is replicated to
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
  def d9EmbedNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embeddings(spark, sfDir).withColumn("blk", floor(col("vec_id") / BlockSize))
    // One O(1) scalar job to size the block grid — the analog of the stats
    // collection AQE does before picking a join strategy. Not a data scan
    // loop: a single max() aggregate returning one long to the driver.
    val nBlocks = e.agg(coalesce(max(col("blk")), lit(0L))).head().getLong(0) + 1
    // Row in block b appears once per block pair it belongs to:
    // as the lo-side for pairs (b, hi), hi in [b, nBlocks); as the hi-side
    // for pairs (lo, b), lo in [0, b]. The diagonal pair (b, b) gets both
    // sides from block b; a_id < b_id dedups it (and is trivially true off
    // the diagonal since blocks tile the id range in order).
    val lo = e.select(
      col("blk").as("lo"), explode(sequence(col("blk"), lit(nBlocks - 1))).as("hi"),
      col("vec_id").as("a_id"), col("v").as("va"))
    val hi = e.select(
      explode(sequence(lit(0L), col("blk"))).as("lo"), col("blk").as("hi"),
      col("vec_id").as("b_id"), col("v").as("vb"))
    // shuffle_hash: replicated sides grow with the block count, so neither
    // may ever be broadcast — the pair key distributes them instead.
    lo.hint("shuffle_hash").join(hi, Seq("lo", "hi"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= 0.45)
      .select(col("a_id"), col("b_id"), round(col("sim"), 6).as("sim"))
  }

  /** Distributed Lloyd's k-means over the embedding column — a REAL coarse
    * quantizer for IVF (d7 uses the precomputed `label` column as its
    * cells; this trains cells from the vectors themselves). Each iteration
    * is one broadcast join of the k×dim centroid table against the corpus
    * (argmin via a `min(struct(dist, cid))` aggregate — deterministic,
    * ties to the lowest cid) and one (cid, dim, value) explode/groupBy for
    * the centroid update. Centroids live in a k×dim driver-side array
    * between iterations — the standard driver-resident centroid model
    * (Spark MLlib's KMeans does the same); the corpus itself never leaves
    * the executors. Seeds are the k lowest vec_ids. Within one training,
    * assignment is fully deterministic (argmin over one collected centroid
    * set, fixed arithmetic); across trainings the centroid update's avg()
    * is subject to floating-point aggregation order like any shuffle
    * reduction, so two independent trainings may differ by ulps — derive
    * all downstream cell logic from ONE training (as [[d13AnnIvfKmeans]]
    * and its spec do). At 100 TB: train the quantizer on a sample, then
    * assign the full corpus with the one final broadcast pass this
    * returns.
    *
    * Returns (vec_id, v, cid).
    */
  /** One assignment pass: nearest trained centroid per vector (squared
    * L2, sequential accumulation; ties break to the lowest cid).
    */
  def assignToCentroids(e: DataFrame, centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cdf = centroids.toDF("cid", "cv")
    val dist = expr("aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), cast(0 as double), (acc, x) -> acc + x)")
    e.join(broadcast(cdf))
      .withColumn("d", dist)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d"), col("cid"))).getField("cid").as("cid"),
        first(col("v")).as("v"))
      .select(col("vec_id"), col("v"), col("cid"))
  }

  /** The trained centroid table after `iters` Lloyd iterations. */
  def kmeansCentroids(e: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    var centroids: Seq[(Int, Seq[Double])] = e.orderBy(col("vec_id")).limit(k)
      .select(col("v")).collect().toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }
    for (_ <- 0 until iters) {
      centroids = assignToCentroids(e, centroids)
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim")).agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").as("cv"))
        .collect().toSeq
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
    }
    centroids
  }

  def kmeansAssign(e: DataFrame, k: Int, iters: Int): DataFrame =
    assignToCentroids(e, kmeansCentroids(e, k, iters))

  /** Cell-probed exact-rerank ANN over any `(vec_id, v, cid)` cell
    * assignment: each query searches only its own cell, like
    * [[d7AnnIvf]]. Note `cells` appears on both sides of the join, so a
    * lazy assignment is evaluated twice per action — cheap here (one
    * broadcast pass over the corpus) because training already ran eagerly
    * in [[kmeansCentroids]].
    */
  def annIvfOverCells(cells: DataFrame): DataFrame = {
    val q = cells.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("cid").as("q_cid"))
    val scored = cells.join(broadcast(q),
        col("cid") === col("q_cid") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("qv"), col("v")).as("sim"))
    topK(scored)
  }

  /** IVF ANN over TRAINED cells: [[kmeansAssign]] quantizes the corpus,
    * then each query probes only its own cell and exact-reranks. Both join
    * sides derive from the single centroid set that training collected, so
    * query and corpus always agree on cells. Not SQL-expressible
    * (iterative training), so the driver records a rows-only check and
    * VectorOpsSpec pins the semantics: assignments are bit-exact argmins,
    * neighbors share the query's cell, similarities agree with the
    * brute-force scorer.
    */
  def d13AnnIvfKmeans(spark: SparkSession, sfDir: String): DataFrame =
    annIvfOverCells(kmeansAssign(embeddings(spark, sfDir), k = 8, iters = 3))

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
}
