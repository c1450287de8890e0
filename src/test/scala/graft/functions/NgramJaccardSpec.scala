package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class NgramJaccardSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** The composed gram-array form the kernel's result must equal. */
  private def composed(a: String, b: String, n: Int): String = {
    def grams(t: String) =
      s"array_distinct(transform(sequence(1, length($t) - ${n - 1}), i -> substring($t, i, $n)))"
    s"size(array_intersect(${grams(a)}, ${grams(b)})) / cast(size(array_union(${grams(a)}, ${grams(b)})) as double)"
  }

  test("kernel equals the composed array_intersect/array_union form on corpus text pairs") {
    val t = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .filter(expr("length(t) >= 8"))
    val pairs = t.select(col("doc_id").as("a_id"), col("t").as("ta"))
      .filter(col("a_id") < 60)
      .crossJoin(t.select(col("doc_id").as("b_id"), col("t").as("tb")))
      .filter(col("a_id") < col("b_id"))
    val diff = pairs.select(
        NgramJaccard.ngramJaccard(col("ta"), col("tb"), 8).as("native"),
        expr(composed("ta", "tb", 8)).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    diff shouldBe 0L
  }

  test("kernel matches the composed form on generated strings at several widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(93)
    val alphabet = "abcd efgh.,äö世"
    def mk = Seq.fill(6 + rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
    val df = Seq.fill(300)((mk, mk)).toDF("ta", "tb")
    Seq(2, 4, 8).foreach { n =>
      val diff = df
        .filter(expr(s"length(ta) >= $n and length(tb) >= $n"))
        .select(
          NgramJaccard.ngramJaccard(col("ta"), col("tb"), n).as("native"),
          expr(composed("ta", "tb", n)).as("hof"))
        .filter(!(col("native") <=> col("hof")))
        .count()
      withClue(s"n=$n:") { diff shouldBe 0L }
    }
  }

  test("identical strings score 1.0; too-short strings yield null like 0/0") {
    import spark.implicits._
    val df = Seq(("abcdefghij", "abcdefghij"), ("abc", "abc")).toDF("ta", "tb")
    val rows = df.select(NgramJaccard.ngramJaccard(col("ta"), col("tb"), 8)).collect()
    rows(0).getDouble(0) shouldBe 1.0
    assert(rows(1).isNullAt(0), "n-gram sets empty on both sides -> null (0/0)")
  }
}
