package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property pin for `CorpusOps.bpeTrain` against an INDEPENDENT
  * in-memory reference implementation of iterated greedy BPE. The
  * engine applies merges through string algebra (boundary-space wrap +
  * left-to-right replace — see the d33 scaladoc); the reference here
  * folds token lists directly. Agreement over randomized corpora proves
  * the string-algebra trick IS greedy merge application — including the
  * self-adjacent run case and cross-iteration composition — not just on
  * the fixture corpus the oracle covers.
  */
class BpeTrainPropSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Reference greedy merge: left-to-right, non-overlapping. */
  private def applyMerge(toks: List[String], l: String, r: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = toks
    while (rest.nonEmpty) rest match {
      case a :: b :: tail if a == l && b == r => out += s"$a+$b"; rest = tail
      case a :: tail => out += a; rest = tail
      case Nil => ()
    }
    out.result()
  }

  /** Reference trainer: per round, count adjacent pairs, merge the
    * (count desc, l asc, r asc) argmax everywhere, iterate.
    */
  private def referenceTrain(docs: Seq[String], iters: Int): Seq[(Int, String, Long)] = {
    var corpus = docs.map(_.trim.toLowerCase.split(" ").toList).filter(_.nonEmpty)
    (1 to iters).flatMap { i =>
      val counts = corpus.flatMap(t => t.zip(t.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (counts.isEmpty) Nil
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        corpus = corpus.map(applyMerge(_, l, r))
        Seq((i, s"$l $r", cnt))
      }
    }
  }

  // small vocab + short docs => dense pair collisions, ties, and runs of
  // the same token (the self-adjacent merge case)
  private val genCorpus: Gen[List[String]] = for {
    nDocs <- Gen.choose(3, 12)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(2, 14)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "ab", "x"))
    } yield ws.mkString(" "))
  } yield docs

  test("property: bpeTrain == in-memory greedy BPE over random small-vocab corpora") {
    import spark.implicits._
    val prop = Prop.forAll(genCorpus) { docs =>
      val want = referenceTrain(docs, iters = 3)
      val got = CorpusOps.bpeTrain(docs.toDF("text"), iters = 3)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      if (got != want) {
        System.err.println(s"corpus=$docs\n got=$got\nwant=$want")
      }
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
