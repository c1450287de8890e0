package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's data-processing surface re-expressed over the `events`
  * table (the Kinesis-stream-shaped testdata: `user_id` plays the role of
  * `partitionKey`, `event_id` of `(sequenceNumber, subSequenceNumber)`,
  * `props` of the `data` payload, `ts` of `approximateArrivalTimestamp`).
  *
  * Sources for the semantics (reference = StreetContxt/kcl-akka-stream):
  *  - Q1 groupByKey oracle: /root/reference/src/it/scala/com/contxt/kinesis/MessageUtil.scala:15-22
  *  - C1 payload decode:    /root/reference/README.md:39-50
  *  - C2 key-prefix filter: /root/reference/src/it/scala/com/contxt/kinesis/KinesisTestComponents.scala:105-113
  *  - C5 per-key ordered pipeline: /root/reference/src/it/scala/com/contxt/kinesis/KinesisTestProducer.scala:37-46
  *  - C6 merge:             /root/reference/src/main/scala/com/contxt/kinesis/KinesisSource.scala:70-74
  *  - C8 take(n):           /root/reference/src/it/scala/com/contxt/kinesis/KinesisSourceTest.scala:56
  *  - O10 initial-position seek: /root/reference/src/main/scala/com/contxt/kinesis/ConsumerConfig.scala:115-139
  *  - Q3 set ops:           /root/reference/src/it/scala/com/contxt/kinesis/KinesisSourceTest.scala:261-271
  *
  * SCALE NOTES (100 TB): every operator here is a single declarative plan —
  * one shuffle per groupBy/window keyed on the stream's partition key, which
  * is exactly the shuffle a sharded stream already implies. No collects, no
  * driver-side loops. Per-key state (Q1's ordered reconstruction) is bounded
  * by per-key volume, the same bound the reference's ShardCheckpointTracker
  * has (/root/reference/src/main/scala/com/contxt/kinesis/KinesisRecord.scala:31-35).
  */
object EventOps {

  /** Q1 `groupByKey`: per-key message reconstruction in sequence order,
    * duplicates preserved. `collect_list` alone is shuffle-order-
    * nondeterministic, so we collect `(seq, msg)` structs and `array_sort`
    * (struct ordering = field order, seq first) before projecting the msgs.
    */
  def q1GroupByKey(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.groupBy(col("user_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("event_id"), col("props")))),
            x => x.getField("props")),
          ",").as("msgs"))
  }

  /** C1 `map`: payload decode (schema-on-read over the opaque payload) —
    * JSON field extraction plus a scalar transform, all codegen'd built-ins.
    */
  def c1Project(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id"),
      col("user_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      round(col("value") * 100).cast("long").as("value_cents"))

  /** C2 `filter`: predicate on the key-ish column (reference drops
    * `bootstrap_`-prefixed keys; here we drop the `err`-prefixed event type).
    * The NOT-startswith predicate is pushed to the parquet scan by Catalyst.
    */
  def c2Filter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(!startswith(col("event_type"), lit("err")))
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** C5 per-key ordered pipeline (`groupBy(key).mapAsync(1).mergeSubstreams`):
    * a window partitioned by key and ordered by sequence number — per-key
    * sequential semantics without any per-key single-threaded bottleneck.
    * One shuffle on user_id; running aggregation is whole-stage codegen'd.
    */
  def c5PerKeyOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir).select(
      col("event_id"),
      col("user_id"),
      row_number().over(w).as("rn"),
      round(sum(col("value")).over(wRun), 2).as("running"))
  }

  /** C6 `merge` / MergeHub fan-in: union of two substreams with provenance. */
  def c6Union(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def side(t: String) =
      ev.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"), lit(t).as("src"))
    side("click").unionByName(side("view"))
  }

  /** C8 `take(n)` as a deterministic top-k: total order (value desc,
    * event_id asc tiebreak) + limit. Spark plans this as TakeOrderedAndProject
    * — a per-partition top-k then a k-row merge on the driver, no full sort,
    * no full shuffle; this is the plan that survives 100 TB.
    */
  def c8TopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("value").desc, col("event_id").asc)
      .limit(100)

  /** C3 `grouped(n)`: fixed-size batching of each key's ordered substream
    * (reference batches for its out-of-order-processing demo,
    * /root/reference/README.md:43). Batch membership is deterministic —
    * rank within key by sequence number, then integer-divide by the batch
    * size — and the per-batch summary (count + first/last sequence number)
    * is a plain partial+final aggregation. One shuffle on the key; no
    * per-batch state is ever wider than the batch.
    */
  def c3Grouped(spark: SparkSession, sfDir: String): DataFrame = {
    val n = 5
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        ((row_number().over(w) - 1) / n).cast("long").as("batch_id"))
      .groupBy(col("user_id"), col("batch_id"))
      .agg(count(lit(1)).as("n_in_batch"),
        min(col("event_id")).as("first_id"),
        max(col("event_id")).as("last_id"))
  }

  /** C4 `mapConcat` (1→N flatten / explode, /root/reference/README.md:45):
    * each record expands into `(k % 3) + 1` child rows via a generated
    * sequence + `explode` — Spark's Generate operator, which pipelines
    * inside the scan stage (no shuffle at all).
    *
    * `%` (sign-of-dividend) matches the oracle's `%` exactly; the fixture
    * guarantees k >= 0, which also sidesteps the one residual divergence
    * (`sequence(1, n)` for n < 1 descends in Spark but `generate_series`
    * is empty in the oracle).
    */
  def c4Explode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .select(col("event_id"),
        explode(sequence(lit(1L), col("k") % lit(3L) + 1L)).as("i"))

  /** O10 initial-position seek (`at-timestamp`): a timestamp predicate that
    * Catalyst pushes into the scan (partition pruning when the table is
    * date-partitioned at scale), followed by a cheap partial+final agg.
    */
  def o10SeekTimestamp(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("ts") >= lit("2024-01-15").cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))

  private def dayUsers(spark: SparkSession, sfDir: String, t: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === t)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct()

  /** Q3 set difference (rebalancing assertion `receivedA -- receivedB`). */
  def q3Except(spark: SparkSession, sfDir: String): DataFrame =
    dayUsers(spark, sfDir, "click").except(dayUsers(spark, sfDir, "purchase"))

  /** Q3 set intersection. */
  def q3Intersect(spark: SparkSession, sfDir: String): DataFrame =
    dayUsers(spark, sfDir, "click").intersect(dayUsers(spark, sfDir, "error"))

  /** Sessionization: gap > 1 h starts a new session — the event-time
    * grouping the reference leaves entirely to downstream code. Expressed as
    * lag + conditional sum so the whole thing is two window passes over one
    * shuffle by key. (Streaming twin: session window / flatMapGroupsWithState,
    * see graft.streaming.)
    */
  def qSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    Tables.events(spark, sfDir)
      .withColumn(
        "new_sess",
        when(prevTs.isNull ||
          unix_micros(col("ts")) - unix_micros(prevTs) > 3600L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Event-time session windows via the NATIVE `session_window` operator
    * (gap = 1 hour): per-(user, session) rows with the session start and
    * event count. Complements [[qSessionize]] (the lag/cumsum encoding) —
    * this is the operator Spark's streaming engine can run with merging
    * session state; one shuffle on the key, session merge inside the agg.
    * Boundary semantics: an event exactly `gap` after the previous one
    * starts a NEW session (the oracle uses `>=` accordingly).
    */
  def qSessionWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** As-of join (composed, not a custom physical operator): each purchase
    * event picks up the most recent prior signup of the same user via
    * last(...ignoreNulls) over an ordered window — the standard Spark-native
    * as-of-join encoding for the self-join case. One shuffle on the key;
    * no range-join explosion.
    */
  def qAsofSignup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn(
        "last_signup",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("last_signup").isNotNull)
      .select(col("event_id"), col("user_id"), col("last_signup"))
  }
}
