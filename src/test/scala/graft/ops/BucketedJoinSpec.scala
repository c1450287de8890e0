package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bucketing = the pre-shuffled layout: two tables bucketed by the join
  * key into the same bucket count join WITHOUT any shuffle exchange —
  * at 100 TB this turns every recurring fact-fact join on the bucket key
  * into a local zip of co-located buckets. This spec proves the property
  * on the physical plan, not just by assertion of results.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("join of co-bucketed tables plans with no shuffle exchange") {
    // warehouse dir is a static conf — tables land in the session default
    // (./spark-warehouse, gitignored) and are dropped with the database
    val db = s"bkt_${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    try {
      val orders = graft.Tables.orders(spark, sf001)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = graft.Tables.customer(spark, sf001)
        .select("c_custkey", "c_name")
      orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(s"$db.orders_b")
      cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable(s"$db.customer_b")

      // disable broadcast so the planner must choose the co-located join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table(s"$db.orders_b")
          .join(spark.table(s"$db.customer_b"),
            col("o_custkey") === col("c_custkey"))
        val physical = joined.queryExecution.executedPlan.toString
        assert(!physical.contains("Exchange hashpartitioning"),
          s"bucketed join must not shuffle:\n$physical")
        // and it is still correct
        val expected = graft.Tables.orders(spark, sf001)
          .join(graft.Tables.customer(spark, sf001),
            col("o_custkey") === col("c_custkey")).count()
        joined.count() shouldBe expected
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally spark.sql(s"DROP DATABASE $db CASCADE")
  }
}
