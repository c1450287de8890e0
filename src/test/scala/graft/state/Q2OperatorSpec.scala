package graft.state

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** Q2's DataFrame operator (replay-injection + collapse over a sorted
  * streaming group iterator) must reproduce the original per-key stream —
  * i.e. equal Q1's ordered reconstruction of `event_id:props` messages.
  */
class Q2OperatorSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("q2DedupReplay collapses the injected suffix replay back to the original stream") {
    val q2 = ReplayCollapse.q2DedupReplay(spark, sf001)

    val expected = Tables.events(spark, sf001)
      .groupBy(col("user_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(
              col("event_id"),
              concat(col("event_id").cast("string"), lit(":"), col("props")).as("msg")))),
            x => x.getField("msg")),
          ",").as("msgs"))

    q2.count() shouldBe expected.count()
    q2.except(expected).count() shouldBe 0L
    expected.except(q2).count() shouldBe 0L
  }

  test("q2DedupReplay plans the secondary sort inside the groupBy shuffle (no per-group buffering)") {
    val plan = ReplayCollapse.q2DedupReplay(spark, sf001).queryExecution.executedPlan.toString
    // flatMapSortedGroups => a SortExec on (key, replay, event_id) feeding
    // MapGroups directly; the collapse consumes a streamed sorted iterator.
    plan should include("MapGroups")
    plan.toLowerCase should include("sort")
  }
}
