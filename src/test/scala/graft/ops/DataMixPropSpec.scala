package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property pins for the two seeded-draw selection/ordering cores —
  * `CorpusOps.interleaveOrderOver` (d42) and
  * `CorpusOps.temperatureMixOver` (d44) — against in-memory references
  * that compute the same md5 draws and sort directly. The DuckDB
  * oracles cover one corpus each; these cover the bucket
  * decomposition's structural edges on random corpora: sources/langs
  * with 0–1 documents, a single source, heavily skewed groups, doc_ids
  * whose draws land on both sides of bucket boundaries, and (for d44)
  * budgets where some language's integer target floors to zero.
  */
class DataMixPropSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** The engines' draw: the shared 60-bit md5 prefix of "<id><salt>". */
  private def drawOf(id: Long, salt: String): Long = md5Prefix60(s"$id$salt")

  private def interleaveRef(rows: Seq[(Long, String)]): Set[(Long, String, Long, Long)] = {
    val slots = rows.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    rows.groupBy(_._2).iterator.flatMap { case (src, members) =>
      members.map(_._1).sortBy(id => (drawOf(id, ":order"), id)).zipWithIndex
        .map { case (id, i) => (id, src, i + 1L, slots(src)) }
    }.toSet
  }

  private def temperatureRef(rows: Seq[(Long, String)]): Set[(Long, String, Long)] = {
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val s = counts.map { case (l, n) => l -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong }
    val (stot, ntot) = (s.values.sum, counts.values.sum)
    val target = counts.map { case (l, n) => l -> math.min(n, (ntot / 2) * s(l) / stot) }
    rows.groupBy(_._2).iterator.flatMap { case (lang, members) =>
      members.map(_._1).sortBy(id => (drawOf(id, ":temp"), id))
        .take(target(lang).toInt).zipWithIndex
        .map { case (id, i) => (id, lang, i + 1L) }
    }.toSet
  }

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    m <- Gen.choose(1, 120)
    ids <- Gen.listOfN(m, Gen.choose(0L, 100000L)).map(_.distinct)
    groups <- Gen.listOfN(ids.length, Gen.oneOf("a", "b", "c", "web", "books"))
  } yield ids.zip(groups)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("d42 core: bucket-decomposed interleave == per-group sort on random corpora") {
    import spark.implicits._
    check(Prop.forAll(corpusGen) { rows =>
      val got = CorpusOps.interleaveOrderOver(
        rows.toDF("doc_id", "source").repartition(7))
        .as[(Long, String, Long, Long)].collect().toSet
      got == interleaveRef(rows)
    })
  }

  test("d44 core: bucket-decomposed temperature selection == per-group sort on random corpora") {
    import spark.implicits._
    check(Prop.forAll(corpusGen) { rows =>
      val got = CorpusOps.temperatureMixOver(
        rows.toDF("doc_id", "lang").repartition(7))
        .as[(Long, String, Long)].collect().toSet
      got == temperatureRef(rows)
    })
  }
}
