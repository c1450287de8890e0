package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local SparkSession for specs. One JVM-wide session (getOrCreate)
  * keeps suite startup O(1) across specs; tests must not mutate session
  * state they don't own.
  */
trait SparkSpec extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SparkSpec.session

  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts was TIMESTAMP(NANOS) in older testdata generations (harmless
      // for the current micros schema); graft.Tables.events normalizes either.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the production deployment hooks — specs run under them so the
      // real paths are tested: the SQL function surface
      // (GraftExtensionsSpec) and config-driven stats registration, the
      // reflective ConsumerStats.scala:33-42 analog (StreamingSpec).
      // streamingQueryListeners is a STATIC conf: builder-time only.
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.streaming.GraftStats")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
