package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2D: the reference has no
  * relational engine — these come from Spark built-ins, declared so Catalyst
  * owns the physical strategy).
  *
  * SCALE NOTES (100 TB):
  *  - dimension joins (`nation`, `region`) carry explicit `broadcast` hints;
  *    fact-fact joins (`lineitem ⋈ orders`) stay shuffle joins on their keys
  *    and benefit from AQE skew splitting at runtime;
  *  - aggregations are partial+final (map-side combine) automatically;
  *  - top-k per group is a window + filter = one shuffle, no global sort;
  *  - global top-k is TakeOrderedAndProject (no full sort).
  */
object RelationalOps {

  /** TPC-H Q1-style pricing summary: wide partial aggregation over the fact
    * table with a pushed-down date predicate.
    */
  def qPricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("n"))

  /** TPC-H Q5-style revenue by nation: star join with broadcast dims.
    * Catalyst pushes the r_name predicate below the join; nation/region are
    * broadcast so the only shuffles are the two fact-side joins.
    */
  def qRevenueByNation(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))

  /** Top-3 orders per customer: ranking window, deterministic tiebreak. */
  def qTopOrdersPerCust(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
  }

  /** Left-semi join: customers that placed at least one order. */
  def qCustWithOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** Left-anti join: customers with no urgent order (NOT EXISTS). */
  def qCustNoUrgent(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(spark, sfDir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
  }

  /** Distinct aggregate: suppliers per part (two-phase distinct agg). */
  def qDistinctSuppliers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        round(sum(col("l_quantity")), 2).as("qty"))

  /** TPC-H Q9-flavored part/supplier profitability: two fact-dimension
    * joins (part filtered + broadcast-eligible, supplier broadcast),
    * grouped by brand and supplier nation. The p_type predicate is pushed
    * below both joins; lineitem is the only shuffled side.
    */
  def qBrandSupplierRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("p_brand"), col("n_name"))
      .agg(
        // per-row cents (deterministic double -> integer), then an EXACT
        // integer sum: immune to float summation-order noise across any
        // shuffle/merge order (a 622-group agg flips last-ulp cents if
        // summed in doubles)
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long"))
          .as("revenue_cents"),
        countDistinct(col("l_suppkey")).as("n_suppliers"))

  /** Exact order statistics per group: median and p90 with linear
    * interpolation (matches DuckDB `quantile_cont`). Exact percentile
    * state is O(distinct values) per group — at 100 TB switch to
    * `approx_percentile` (t-digest sketch, mergeable, bounded memory);
    * kept exact here because the oracle compares values.
    */
  def qPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        // one array-typed quantile call = ONE value buffer per group, not
        // one per requested quantile. The buffer is the r16 primitive
        // kernel (graft.functions.ExactQuantiles) — value-identical to
        // the built-in `percentile`, without its boxed per-distinct-value
        // OpenHashMap, which deduplicated nothing here (measured:
        // l_extendedprice is >97% distinct per group, so the map was pure
        // per-row boxing/hashing overhead; the r15-verdict pre-aggregate
        // idea fails on the same evidence and was not taken)
        graft.functions.ExactQuantiles.exactQuantiles(
          col("l_extendedprice"), Seq(0.5, 0.9)).as("ps"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p50"),
        round(element_at(col("ps"), 2), 4).as("p90"),
        col("n"))

  /** The 100 TB form of [[qPercentiles]] + [[qDistinctSuppliers]] in one
    * pass, as DETERMINISTIC KMV sketches ([[graft.functions.BottomKPairs]])
    * instead of `approx_percentile`/HLL++, whose kept elements/sketch
    * bits depend on partial-merge order and so admit no value-exact
    * oracle. Min-k-of-a-set is merge-order independent, so every output
    * bit here is replayed exactly by the DuckDB oracle — a full hash
    * gate on an approximate query.
    *
    *  - percentiles: the k=1024 rows per group with the smallest
    *    portable 60-bit md5(orderkey_linenumber) hashes are a uniform
    *    row sample; p50/p90 are its order statistics at rank
    *    ceil(p·kk) (integer form `(10p·kk + 9) div 10`), in exact cents.
    *  - distinct suppliers: KMV over md5(suppkey) — duplicates collapse
    *    by set semantics; below k=64 distinct the count is exact, above
    *    it the 64th-smallest hash h_64 estimates n ≈ floor(63·2^60/h_64)
    *    (both engines evaluate the identical IEEE expression).
    *
    * One scan, one partial+final aggregation, O(k) state per group
    * regardless of input size — the same memory contract as the built-in
    * sketches, which remain as [[qApproxStatsBuiltin]] (error-bounded by
    * ApproxStatsSpec; the KMV form's own bounds are in ApproxKmvSpec).
    */
  def qApproxStats(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.BottomKPairs.bottomKPairs
    import graft.functions.Md5Prefix64.md5Prefix64
    val rows = Tables.lineitem(spark, sfDir).select(
      col("l_returnflag"),
      element_at(md5Prefix64(array(
        concat_ws("_", col("l_orderkey"), col("l_linenumber")))), 1).as("hr"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"),
      element_at(md5Prefix64(array(col("l_suppkey").cast("string"))), 1).as("hs"))
    rows.groupBy(col("l_returnflag"))
      .agg(
        bottomKPairs(col("hr"), col("cents"), 1024).as("smp"),
        bottomKPairs(col("hs"), col("hs"), 64).as("kmv"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        expr("array_sort(transform(smp, s -> s.v))").as("vals"),
        size(col("smp")).cast("long").as("kk"),
        expr("transform(kmv, s -> s.h)").as("hks"),
        col("n"))
      .select(col("l_returnflag"),
        expr("element_at(vals, cast((5 * kk + 9) div 10 as int))").as("p50_cents"),
        expr("element_at(vals, cast((9 * kk + 9) div 10 as int))").as("p90_cents"),
        expr("CASE WHEN size(hks) < 64 THEN cast(size(hks) as bigint) " +
          "ELSE cast(floor(63.0 * 1152921504606846976.0 / cast(element_at(hks, 64) as double)) as bigint) END")
          .as("n_supp_approx"),
        col("n"))
  }

  /** The built-in-sketch twin of [[qApproxStats]]: `approx_percentile`
    * (mergeable quantile sketch, bounded memory per group where exact
    * percentile state is O(distinct values)) and `approx_count_distinct`
    * (HLL++, ~kilobytes per group at 2% rsd). Kept as library surface —
    * merge-order-dependent bits mean no value-exact oracle, so
    * ApproxStatsSpec pins the error bounds against the exact answers
    * instead, the contract these sketches actually make.
    */
  def qApproxStatsBuiltin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)").as("ps"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("n_supp_approx"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p50_approx"),
        round(element_at(col("ps"), 2), 4).as("p90_approx"),
        col("n_supp_approx"), col("n"))

  /** Pivot: per-customer order counts by priority — conditional
    * aggregation with a FIXED pivot-value list (never an implicit
    * distinct-scan of the pivot column, which at scale is a separate
    * job); compiles to one partial+final aggregation.
    */
  def qPivotPriority(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
      .agg(count(lit(1)))
      // fill only the pivot cells — a blanket fill would also rewrite the
      // group key under a future nullable-key schema
      .na.fill(0L, Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
      .withColumnRenamed("1-URGENT", "urgent")
      .withColumnRenamed("2-HIGH", "high")
      .withColumnRenamed("3-MEDIUM", "medium")

  /** ROLLUP grouping sets over the region→nation hierarchy. */
  def qRollupRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n_orders"))
}
