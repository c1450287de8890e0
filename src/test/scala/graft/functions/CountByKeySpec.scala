package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins `count_by_key` — the grouped-count-without-groupBy aggregate the
  * per-shard consumer gauges ride on (it must be a plain aggregate
  * expression to be legal inside `Dataset.observe`).
  */
class CountByKeySpec extends AnyFunSuite with SparkSpec with Matchers {
  import CountByKey.countByKey

  test("map result equals the equivalent groupBy count") {
    import spark.implicits._
    val df = Seq(3, 1, 2, 1, 3, 3, 1, 2).toDF("k")
    val got = df.agg(countByKey(col("k")).as("m"))
      .collect().head.getAs[scala.collection.Map[Int, Long]]("m").toMap
    got shouldBe Map(1 -> 3L, 2 -> 2L, 3 -> 3L)
  }

  test("null keys are skipped, like count(col); empty input yields an empty map") {
    import spark.implicits._
    val df = Seq[Option[Long]](Some(7L), None, Some(7L), None).toDF("k")
    val got = df.agg(countByKey(col("k")).as("m"))
      .collect().head.getAs[scala.collection.Map[Long, Long]]("m").toMap
    got shouldBe Map(7L -> 2L)
    val empty = df.filter(lit(false)).agg(countByKey(col("k")).as("m"))
      .collect().head.getAs[scala.collection.Map[Long, Long]]("m").toMap
    empty shouldBe Map.empty[Long, Long]
  }

  test("partial-aggregate merge across many partitions is exact") {
    import spark.implicits._
    val df = spark.range(0, 10000).repartition(32)
      .select(pmod(col("id"), lit(7)).cast("int").as("k"))
    val got = df.agg(countByKey(col("k")).as("m"))
      .collect().head.getAs[scala.collection.Map[Int, Long]]("m").toMap
    val want = df.groupBy("k").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    got shouldBe want
  }

  test("non-integral key is rejected at analysis time") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("k")
    val e = intercept[Exception] { df.agg(countByKey(col("k"))).collect() }
    e.getMessage.toLowerCase should include("integral")
  }
}
