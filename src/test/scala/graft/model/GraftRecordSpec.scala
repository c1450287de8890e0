package graft.model

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftRecordSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("sequence numbers order as DECIMAL(38,0) — string and double orderings both fail") {
    import spark.implicits._
    val seqs = Seq(
      "9", "10", "100",
      "99999999999999999999", // > Long.MaxValue
      BigInt(10).pow(37).toString, // 38 digits
      (BigInt(10).pow(37) + 1).toString)
    val numeric = seqs.sortBy(BigInt(_))
    // the two orderings the decimal cast protects against:
    assert(seqs.sorted != numeric, "lexicographic order must differ on this fixture")
    assert(seqs.map(_.toDouble).distinct.size < seqs.size,
      "double round-trip must collapse 38-digit neighbors on this fixture")

    val ordered = seqs.toDF("sequence_number")
      .orderBy(GraftRecord.sequenceOrder(col("sequence_number")))
      .collect().map(_.getString(0)).toSeq
    ordered shouldBe numeric
  }

  test("per-key ordered reconstruction over (sequence, subSequence) — the groupByKey envelope demo") {
    import spark.implicits._
    val t = Timestamp.valueOf("2024-01-15 00:00:00")
    val big = BigInt(10).pow(37)
    // shuffled input; per key the payloads a..e belong in sequence order,
    // with a KPL aggregate (same sequenceNumber, subSequence 0/1) in k1
    val records = Seq(
      GraftRecord("c".getBytes, "k1", (big + 21).toString, 0L, 0, t),
      GraftRecord("e".getBytes, "k2", "100", 0L, 1, t),
      GraftRecord("a".getBytes, "k1", "9", 0L, 0, t),
      GraftRecord("d".getBytes, "k1", (big + 21).toString, 1L, 0, t),
      GraftRecord("b".getBytes, "k1", "10", 0L, 0, t),
      GraftRecord("d".getBytes, "k2", "99", 0L, 1, t)).toDS()

    val rebuilt = records
      .groupBy(col("partitionKey"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(
          GraftRecord.sequenceOrder(col("sequenceNumber")).as("seq"),
          col("subSequenceNumber").as("sub"),
          col("data").cast("string").as("payload")))),
        r => r.getField("payload")), "").as("msg"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    rebuilt shouldBe Map("k1" -> "abcd", "k2" -> "de")
  }
}
