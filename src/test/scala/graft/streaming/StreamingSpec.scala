package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.collection.mutable

/** Pins the delivery-semantics layer the reference exists for
  * (SURVEY.md §0): at-least-once replay after failure (lease-lost analog,
  * RecordProcessorImpl.scala:164-166), WAL-before-commit checkpointing
  * (O7/O8), graceful stop (O11/O13/C11), listener stats (O15), the
  * inspectable sink (C10) and exactly-once via the idempotent
  * foreachBatch sink (O5's replacement, SURVEY.md §7.4).
  */
object StreamingSpec {
  // cross-run state for the crash-injection sinks (single forked test JVM)
  val received: mutable.Buffer[(Long, Seq[Long])] = mutable.Buffer.empty
  @volatile var crashOnBatch: Long = -1L
  @volatile var crashed: Boolean = false
}

class StreamingSpec extends AnyFunSuite with SparkSpec with Matchers {
  import StreamingSpec._

  private def newBase(): String = Files.createTempDirectory("graft-spec-").toString

  private def shardDir(base: String): String = {
    val dir = s"$base/shards"
    ShardedEvents.materialize(spark, sf001, dir)
    dir
  }

  private def batchEventIds = graft.Tables.events(spark, sf001)
    .select("event_id").collect().map(_.getLong(0)).toSeq

  test("at-least-once: crash after side effect, restart replays exactly the uncommitted batch") {
    val base = newBase()
    val shards = shardDir(base)
    val ckpt = s"$base/ckpt"
    received.clear(); crashed = false; crashOnBatch = 2L

    def start() = ShardedEvents.readStream(spark, shards, maxFilesPerTrigger = Some(1))
      .select("event_id")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val ids = df.collect().map(_.getLong(0)).toSeq
        received.synchronized { received += ((batchId, ids)) }
        // crash AFTER the side effect but BEFORE the epoch commit —
        // the worker-death / lease-lost scenario
        if (batchId == crashOnBatch && !crashed) {
          crashed = true
          throw new RuntimeException(s"injected failure in batch $batchId")
        }
      }
      .start()

    val q1 = start()
    intercept[Exception] { q1.awaitTermination() }
    assert(q1.exception.isDefined, "worker death must surface through query.exception")

    // WAL discipline: batch 2's offsets were written (intent), not committed
    val offsetsAfterCrash = StreamControl.checkpointOffsets(ckpt)
    val commitsAfterCrash = StreamControl.checkpointCommits(ckpt)
    assert(offsetsAfterCrash == commitsAfterCrash + 1,
      s"expected exactly one uncommitted epoch, got offsets=$offsetsAfterCrash commits=$commitsAfterCrash")

    // restart from the same checkpoint: resumes at batch 2, replays it
    val q2 = start()
    q2.awaitTermination()
    assert(StreamControl.checkpointOffsets(ckpt) == StreamControl.checkpointCommits(ckpt))

    val deliveredBatchIds = received.map(_._1)
    assert(deliveredBatchIds.count(_ == crashOnBatch) == 2, "uncommitted batch must be redelivered")
    deliveredBatchIds.filter(_ < crashOnBatch).groupBy(identity).foreach { case (_, g) =>
      assert(g.size == 1, "committed batches must NOT be redelivered")
    }

    // duplicates exist (at-least-once), and dedup == the batch ground truth
    val all = received.flatMap(_._2)
    assert(all.size > all.distinct.size)
    all.distinct.sorted shouldBe batchEventIds.sorted
  }

  test("exactly-once: idempotent foreachBatch sink collapses the replayed batch") {
    val base = newBase()
    val shards = shardDir(base)
    val ckpt = s"$base/ckpt"
    val out = s"$base/out"
    crashed = false; crashOnBatch = 2L

    def start() = ShardedEvents.readStream(spark, shards, maxFilesPerTrigger = Some(1))
      .select("event_id", "user_id", "event_type")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        IdempotentSink.writeBatch(df, batchId, out)
        if (batchId == crashOnBatch && !crashed) {
          crashed = true
          throw new RuntimeException("crash after sink write, before commit")
        }
      }
      .start()

    intercept[Exception] { start().awaitTermination() }
    val q2 = start(); q2.awaitTermination()

    // batch 2 was written twice, but the second write overwrote the first:
    // end-to-end output is exactly the batch ground truth
    val sinkSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, user_id BIGINT, event_type STRING")
    val ids = IdempotentSink.readAll(spark, out, sinkSchema)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    ids.size shouldBe ids.distinct.size
    ids.sorted shouldBe batchEventIds.sorted
  }

  test("idempotent sink: zero committed batches reads as empty, not an error") {
    val out = Files.createTempDirectory("graft-empty-sink-").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL("event_id BIGINT, n BIGINT")
    val df = IdempotentSink.readAll(spark, out, schema)
    df.count() shouldBe 0
    df.schema.fieldNames shouldBe Array("event_id", "n")
  }

  test("checkpoint state is inspectable OFFLINE via the state-store reader") {
    // the batch-side analog of the reference's checkpoint observability
    // (ShardCheckpointTracker state was only visible through logs): a
    // stopped query's aggregation state reads back as a batch DataFrame
    // from the checkpoint alone — no query restart — and must agree with
    // the batch ground truth
    val base = newBase()
    val dir = shardDir(base)
    val ckpt = s"$base/ckpt"
    val q = ShardedEvents.readStream(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(s"state_inspect_${System.nanoTime()}")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // schema: key struct(grouping cols), value struct(agg buffer), partition_id
    val got = spark.read.format("statestore").load(ckpt)
      .select(col("key.event_type"), col("value.count").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = graft.Tables.events(spark, sf001)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe expected
  }

  test("listener stats mirror ConsumerStats hooks: init, per-batch rows, shutdown") {
    val base = newBase()
    val shards = shardDir(base)
    val stats = new GraftStats
    spark.streams.addListener(stats)
    try {
      val q = ShardedEvents.readStream(spark, shards)
        .groupBy(col("event_type")).count()
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(s"stats_${System.nanoTime()}")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // listener bus is async; progress events may trail termination
      val deadline = System.nanoTime() + 10_000_000_000L
      while ((!stats.terminated.get() || stats.rows.get() < batchEventIds.size) &&
        System.nanoTime() < deadline) Thread.sleep(50)
      assert(stats.started.get())
      assert(stats.terminated.get())
      assert(!stats.failed.get())
      assert(stats.batches.get() >= 1)
      assert(stats.rows.get() == batchEventIds.size)
    } finally spark.streams.removeListener(stats)
  }

  test("graceful stop: ProcessingTime query drains and stops at a batch boundary") {
    val base = newBase()
    val shards = shardDir(base)
    val mem = s"inspect_${System.nanoTime()}"
    val q = ShardedEvents.readStream(spark, shards, maxFilesPerTrigger = Some(2))
      .groupBy(col("event_type")).count()
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(mem)
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    q.processAllAvailable()
    // C10 Inspectable: results visible mid-stream, while the query is live
    assert(q.isActive)
    val live = spark.table(mem).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(live.values.sum == batchEventIds.size)
    StreamControl.stopGracefully(q)
    assert(!q.isActive)
    assert(q.exception.isEmpty)
  }

  test("per-key state persists across micro-batches (mapGroupsWithState tracker)") {
    val base = newBase()
    val shards = shardDir(base)
    val finalStates = mutable.Map.empty[Long, PerKeyTracker.KeyState]
    val q = PerKeyTracker.track(
        ShardedEvents.readStream(spark, shards, maxFilesPerTrigger = Some(2)))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[(Long, PerKeyTracker.KeyState)], _: Long) =>
        // later batches overwrite: the tracker emits cumulative state
        ds.collect().foreach { case (k, s) => finalStates.synchronized { finalStates(k) = s } }
      }
      .start()
    q.awaitTermination()

    val truth = graft.Tables.events(spark, sf001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("mn"), max(col("event_id")).as("mx"))
      .collect()
      .map(r => r.getLong(0) -> PerKeyTracker.KeyState(r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    finalStates.toMap shouldBe truth
  }

  test("per-key arrival order within a shard is sequence order (ordered-shard fidelity)") {
    val base = newBase()
    val shards = shardDir(base)
    val arrivals = mutable.Buffer.empty[(Long, Long)] // (user_id, event_id)
    val q = ShardedEvents.readStream(spark, shards, maxFilesPerTrigger = Some(1))
      .select("user_id", "event_id")
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // one file (= one shard chunk) per batch; collect preserves the
        // file's row order
        val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        arrivals.synchronized { arrivals ++= rows }
        ()
      }
      .start()
    q.awaitTermination()
    arrivals.groupBy(_._1).foreach { case (user, seq) =>
      val ids = seq.map(_._2)
      assert(ids == ids.sorted, s"user $user observed out-of-order arrivals")
    }
    arrivals.size shouldBe batchEventIds.size
  }

  test("two consumers on disjoint shard subsets partition the stream (rebalance analog)") {
    // the reference's rebalance it-tests assert each consumer received a
    // non-empty exclusive set and the union is complete
    // (KinesisSourceTest.scala:101-127, 261-271)
    val base = newBase()
    val shards = shardDir(base)
    def consume(which: String, pred: org.apache.spark.sql.Column): Seq[Long] = {
      val got = mutable.Buffer.empty[Long]
      val q = ShardedEvents.readStream(spark, shards)
        .filter(pred)
        .select("event_id")
        .writeStream
        .option("checkpointLocation", s"$base/ckpt-$which")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = df.collect().map(_.getLong(0))
          got.synchronized { got ++= ids }
          ()
        }
        .start()
      q.awaitTermination(); got.toSeq
    }
    val a = consume("a", col("shard") < ShardedEvents.NumShards / 2)
    val b = consume("b", col("shard") >= ShardedEvents.NumShards / 2)
    assert(a.nonEmpty && b.nonEmpty)
    assert(a.toSet.intersect(b.toSet).isEmpty, "consumers must hold exclusive sets")
    (a ++ b).sorted shouldBe batchEventIds.sorted
  }

  test("dropDuplicatesWithinWatermark: exactly-once delivery with BOUNDED dedup state") {
    // the production form of s2's unbounded-state dedup
    // (StreamingQueries.scala): state rows older than the watermark are
    // evicted, so dedup state is O(watermark window), not O(stream)
    val base = newBase()
    val dir = s"$base/shards"
    val events = graft.Tables.events(spark, sf001)
    val tsCuts = events
      .selectExpr("percentile(cast(ts as double), array(0.3333, 0.6667)) as c")
      .head().getSeq[Double](0)
    def tranche(lo: Option[Double], hi: Option[Double]) = {
      val t = events
      val lof = lo.map(v => t.filter(col("ts").cast("double") > v)).getOrElse(t)
      hi.map(v => lof.filter(col("ts").cast("double") <= v)).getOrElse(lof)
    }
    val tranches = Seq(
      tranche(None, Some(tsCuts(0))),
      tranche(Some(tsCuts(0)), Some(tsCuts(1))),
      tranche(Some(tsCuts(1)), None))

    // every record written TWICE: at-least-once delivery with duplicates
    ShardedEvents.appendTranche(tranches.head.union(tranches.head), dir, 4)
    val got = mutable.Buffer.empty[Long]
    val q = ShardedEvents.readStream(spark, dir)
      .withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id")
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect().map(_.getLong(0))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    q.processAllAvailable()
    tranches.tail.foreach { t =>
      ShardedEvents.appendTranche(t.union(t), dir, 4)
      q.processAllAvailable()
    }
    val stateRows = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsTotal)
    StreamControl.stopGracefully(q)

    // duplicates collapsed: every event delivered exactly once
    val g = got.synchronized(got.toVector)
    g.sorted shouldBe batchEventIds.sorted
    // state is bounded by the watermark window: eviction must have kicked
    // in, so the dedup state never held one row per record ever seen
    assert(stateRows.exists(_ > 0), "dedup must keep some state")
    assert(stateRows.max < batchEventIds.size,
      s"state grew to ${stateRows.max} — unbounded (plain dropDuplicates would hold ${batchEventIds.size})")
  }

  test("stream-stream interval join: complete result with BOUNDED join state under an advancing watermark") {
    // the production form of s6's generous-watermark join
    // (StreamingQueries.scala): with time-ordered arrival, a tight
    // watermark + the range condition evict both sides' join state, so
    // state is O(join window), not O(stream)
    val base = newBase()
    val dir = s"$base/shards"
    val events = graft.Tables.events(spark, sf001)
    val tsCuts = events
      .selectExpr("percentile(cast(ts as double), array(0.3333, 0.6667)) as c")
      .head().getSeq[Double](0)
    def tranche(lo: Option[Double], hi: Option[Double]) = {
      val t = events
      val lof = lo.map(v => t.filter(col("ts").cast("double") > v)).getOrElse(t)
      hi.map(v => lof.filter(col("ts").cast("double") <= v)).getOrElse(lof)
    }
    val tranches = Seq(
      tranche(None, Some(tsCuts(0))),
      tranche(Some(tsCuts(0)), Some(tsCuts(1))),
      tranche(Some(tsCuts(1)), None))

    ShardedEvents.appendTranche(tranches.head, dir, 4)
    val src = ShardedEvents.readStream(spark, dir)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 minute")
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      .withWatermark("c_ts", "1 minute")
    val got = mutable.Buffer.empty[(Long, Long)]
    val q = purchases.join(clicks,
        col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("interval 30 minutes") &&
        col("c_ts") <= col("p_ts"))
      .select("p_id", "c_id")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    q.processAllAvailable()
    tranches.tail.foreach { t =>
      ShardedEvents.appendTranche(t, dir, 4)
      q.processAllAvailable()
    }
    val stateRows = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsTotal)
    StreamControl.stopGracefully(q)

    // complete: every batch-join pair was emitted exactly once
    val expected = {
      val p = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      val c = events.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      p.join(c, col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("interval 30 minutes") &&
          col("c_ts") <= col("p_ts"))
        .select("p_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    }
    val g = got.synchronized(got.toVector)
    g.sorted shouldBe expected.sorted
    // join state is evicted by the watermark: it never held every
    // purchase/click row ever seen
    val totalPc = events
      .filter(col("event_type").isin("purchase", "click")).count()
    assert(stateRows.exists(_ > 0), "the join must keep some state")
    assert(stateRows.max < totalPc,
      s"state grew to ${stateRows.max} — unbounded (an unwatermarked join would hold $totalPc)")
  }

  test("streaming session_window APPEND mode: closed sessions emit exactly once; open-session state is bounded") {
    // the production form of s9's complete-mode sessionization
    // (StreamingQueries.scala): in append mode a session emits exactly
    // once, when the watermark passes its close, and its state row is
    // evicted — state is O(open sessions), not O(all sessions ever)
    val base = newBase()
    val dir = s"$base/shards"
    val events = graft.Tables.events(spark, sf001)
    val tsCuts = events
      .selectExpr("percentile(cast(ts as double), array(0.3333, 0.6667)) as c")
      .head().getSeq[Double](0)
    def tranche(lo: Option[Double], hi: Option[Double]) = {
      val t = events
      val lof = lo.map(v => t.filter(col("ts").cast("double") > v)).getOrElse(t)
      hi.map(v => lof.filter(col("ts").cast("double") <= v)).getOrElse(lof)
    }
    val tranches = Seq(
      tranche(None, Some(tsCuts(0))),
      tranche(Some(tsCuts(0)), Some(tsCuts(1))),
      tranche(Some(tsCuts(1)), None))

    ShardedEvents.appendTranche(tranches.head, dir, 4)
    val got = mutable.Buffer.empty[(Long, java.sql.Timestamp, Long)]
    val q = ShardedEvents.readStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("n_events"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    q.processAllAvailable()
    tranches.tail.foreach { t =>
      ShardedEvents.appendTranche(t, dir, 4)
      q.processAllAvailable()
    }
    val stateRows = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsTotal)
    StreamControl.stopGracefully(q)

    // batch truth: the same session_window aggregation over everything
    val batchSessions = events
      .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet

    val g = got.synchronized(got.toVector)
    assert(g.nonEmpty, "the advancing watermark must close and emit early sessions")
    g.size shouldBe g.toSet.size // each closed session emitted exactly once
    assert(g.toSet.subsetOf(batchSessions),
      "every emitted session must match the batch aggregation exactly")
    // sessions still open at the end never emitted — and were never state-resident together
    assert(stateRows.max < batchSessions.size,
      s"state grew to ${stateRows.max} — unbounded (all-sessions would hold ${batchSessions.size})")
  }

  test("seek latest: only records appended after the stream opens are delivered") {
    // ConsumerConfig.scala:115-139 `latest`: subscribe at the current end
    // of every shard; pre-existing records are never delivered, records
    // appended afterwards (and shards created afterwards) all are
    val base = newBase()
    val dir = s"$base/shards"
    val events = graft.Tables.events(spark, sf001)
    val ids = batchEventIds.sorted
    val cut = ids(ids.size / 2)
    ShardedEvents.appendTranche(events.filter(col("event_id") <= cut), dir, 4)

    val got = mutable.Buffer.empty[Long]
    val q = ShardedEvents.readStreamFrom(spark, dir, ShardedEvents.Seek.Latest)
      .select("event_id")
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect().map(_.getLong(0))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    q.processAllAvailable()
    got.synchronized(assert(got.isEmpty, "latest must skip everything before the subscribe point"))

    // appended after open: delivered — including into a NEW shard set (8)
    ShardedEvents.appendTranche(events.filter(col("event_id") > cut), dir, 8)
    q.processAllAvailable()
    StreamControl.stopGracefully(q)
    got.synchronized(got.sorted.toVector) shouldBe ids.filter(_ > cut).toVector
  }

  test("re-sharding: stream stays complete across a shard split (4->8) and merge (8->2)") {
    // the reference's resharding it-tests prove no record is lost or
    // duplicated when the shard set changes under a live consumer
    // (KinesisSourceTest.scala:182-228); here the shard set changes
    // between micro-batches and the same completeness oracle must hold
    val base = newBase()
    val dir = s"$base/shards"
    val events = graft.Tables.events(spark, sf001)
    val ids = batchEventIds.sorted
    val (c1, c2) = (ids(ids.size / 3), ids(2 * ids.size / 3))
    ShardedEvents.appendTranche(events.filter(col("event_id") <= c1), dir, 4)

    val arrivals = mutable.Buffer.empty[(Int, Long)] // (shard, event_id)
    val q = ShardedEvents.readStream(spark, dir)
      .select("shard", "event_id")
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect().map(r => (r.getInt(0), r.getLong(1)))
        arrivals.synchronized { arrivals ++= rows }
        ()
      }
      .start()
    q.processAllAvailable()
    arrivals.synchronized {
      assert(arrivals.map(_._2).toSet == ids.filter(_ <= c1).toSet)
      assert(arrivals.forall(_._1 < 4), "pre-split tranche must live in 4 shards")
    }

    // SPLIT 4->8: child shards appear as new dirs under the live stream
    ShardedEvents.appendTranche(events.filter(col("event_id") > c1 && col("event_id") <= c2), dir, 8)
    q.processAllAvailable()
    arrivals.synchronized {
      assert(arrivals.exists(_._1 >= 4), "split children must be discovered and consumed")
    }

    // MERGE 8->2: later records collapse back into two shards
    ShardedEvents.appendTranche(events.filter(col("event_id") > c2), dir, 2)
    q.processAllAvailable()
    StreamControl.stopGracefully(q)

    val got = arrivals.synchronized(arrivals.toVector)
    got.map(_._2).toSet shouldBe ids.toSet                 // nothing lost
    got.size shouldBe got.map(_._2).distinct.size          // nothing duplicated
    // each record observed from exactly one shard (exclusive routing)
    got.groupBy(_._2).values.foreach(v => assert(v.map(_._1).distinct.size == 1))
  }

  test("streaming result == batch result (the reference's core oracle) for s1/s2") {
    val s1 = StreamingQueries.s1StreamHourlyAgg(spark, sf001)
    val b1 = graft.Tables.events(spark, sf001)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
    assert(s1.exceptAll(b1).isEmpty && b1.exceptAll(s1).isEmpty)

    val s2 = StreamingQueries.s2StreamDedupCount(spark, sf001)
    val b2 = graft.Tables.events(spark, sf001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("event_id")).as("n_distinct"))
    assert(s2.exceptAll(b2).isEmpty && b2.exceptAll(s2).isEmpty)
  }

  test("incremental near-dup finds every pair ACROSS micro-batches (1-file triggers)") {
    // one shard file per micro-batch: a near-dup pair routed to different
    // shards has its members arrive in different batches, so every such
    // pair can only be found against bucket STATE, not within a batch
    val streamed = StreamingQueries.s8StreamNearDup(spark, sf001, maxFilesPerTrigger = Some(1))
    val batch = graft.ops.CorpusOps.d2MinhashLsh(spark, sf001)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("incremental dup-span marking emits the first occurrence RETROACTIVELY across micro-batches") {
    // 1-file triggers: a window shared by docs in different shards has
    // its first sighting stored in state for whole batches before the
    // second arrives and surfaces both — the marked-position set must
    // still equal batch d28's, independent of interleaving
    import org.apache.spark.sql.functions.{size => asize}
    val streamed = StreamingQueries
      .s11StreamDupPositions(spark, sf001, maxFilesPerTrigger = Some(1))
      .select(col("doc_id"), col("pos"))
    val docs = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .filter(asize(split(col("t"), " ")) >= 8)
      .select(col("doc_id"),
        posexplode(graft.functions.WordWindowMd5.wordWindowMd5(col("t"), 8)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("gh"))
    val dup = docs.groupBy(col("gh")).count().filter(col("count") >= 2).select("gh")
    val batchMarked = docs.join(dup, "gh").select(col("doc_id"), col("pos"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batchMarked).isEmpty && batchMarked.exceptAll(streamed).isEmpty)
  }
}
