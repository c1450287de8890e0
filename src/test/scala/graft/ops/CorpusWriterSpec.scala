package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the export layout of [[CorpusOps.writeCorpusShards]]: lossless
  * round trip, hive lang partitions, the per-file record bound, and the
  * property the layout exists FOR — per-lang doc_id file intervals are
  * pairwise disjoint, so file-level min/max stats prune point/range
  * reads without opening the files.
  */
class CorpusWriterSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val MaxPerFile = 40

  test("writeCorpusShards: lossless, lang-partitioned, size-bounded, file ranges disjoint per lang") {
    val out = java.nio.file.Files.createTempDirectory("graft-export-").toString + "/corpus"
    val docs = graft.Tables.documents(spark, sf001)
    CorpusOps.writeCorpusShards(docs, out, MaxPerFile)

    // 1. hive partition dirs, one per lang
    val langDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    val langs = docs.select(col("lang")).distinct().collect().map(_.getString(0)).sorted
    langDirs.toSeq shouldBe langs.toSeq.map("lang=" + _)

    // 2. lossless round trip (partition column included)
    val back = spark.read.parquet(out).select(docs.columns.map(col): _*)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)

    // 3 + 4. per-file record bound and pairwise-disjoint doc_id ranges
    // within each lang (read per file, keyed by input_file_name)
    val perFile = back
      .withColumn("f", input_file_name())
      .groupBy(col("lang"), col("f"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .collect()
    perFile.foreach { r =>
      assert(r.getLong(2) <= MaxPerFile,
        s"file ${r.getString(1)} holds ${r.getLong(2)} rows > $MaxPerFile")
    }
    perFile.groupBy(_.getString(0)).foreach { case (lang, files) =>
      val iv = files.map(r => (r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      iv.zip(iv.drop(1)).foreach { case ((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"lang=$lang: file intervals [..,$hiA] and [$loB,..] overlap")
      }
    }
  }

  test("writeCorpusShards splits an oversized range partition into multiple bounded files") {
    val out = java.nio.file.Files.createTempDirectory("graft-export-").toString + "/one"
    val docs = graft.Tables.documents(spark, sf001)
    // 1 range partition forces everything through one writer task: the
    // record cap alone must split the output
    CorpusOps.writeCorpusShards(docs, out, MaxPerFile, rangePartitions = 1)
    val back = spark.read.parquet(out).select(docs.columns.map(col): _*)
    val nFiles = back.select(input_file_name()).distinct().count()
    val total = docs.count()
    assert(nFiles >= (total + MaxPerFile - 1) / MaxPerFile,
      s"$total rows in $nFiles files under cap $MaxPerFile")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("a point read on the export prunes to one lang partition and pushes the doc_id range") {
    val out = java.nio.file.Files.createTempDirectory("graft-export-").toString + "/pruned"
    val docs = graft.Tables.documents(spark, sf001)
    CorpusOps.writeCorpusShards(docs, out, MaxPerFile)
    val all = spark.read.parquet(out)
    val totalFiles = all.select(input_file_name()).distinct().count()

    val q = all.filter(col("lang") === "en" && col("doc_id").between(100L, 120L))
    q.collect() // materialize so scan metrics are populated
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in the read plan"))

    // lang is a hive partition column: it must prune DIRECTORIES, not filter rows
    assert(scan.toString.contains("PartitionFilters"), scan.toString)
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(scan.toString).isDefined,
      s"lang predicate must be a partition filter:\n$scan")
    // the doc_id range must reach the parquet reader (row-group/page skip
    // via the min/max stats the disjoint layout guarantees)
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(doc_id".r
      .findFirstIn(scan.toString).isDefined, s"doc_id range not pushed:\n$scan")
    // the scan listed ONLY lang=en files — fewer than the export total
    val scanned = scan.metrics("numFiles").value
    val enFiles = all.filter(col("lang") === "en")
      .select(input_file_name()).distinct().count()
    assert(scanned == enFiles && scanned < totalFiles,
      s"scan listed $scanned files; lang=en holds $enFiles of $totalFiles")

    // and the answer matches the unpruned path
    val truth = docs.filter(col("lang") === "en" && col("doc_id").between(100L, 120L)).count()
    assert(q.count() == truth)
  }
}
