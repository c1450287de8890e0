package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class WordShingleJaccardSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** The composed shingle-array form the kernel's result must equal —
    * CorpusOps.ShingleSql verbatim, over ws = split(t, " ").
    */
  private def composed(a: String, b: String, n: Int): String = {
    def sh(t: String) = {
      val parts = (0 until n).map(j => s"ws[i + $j]").mkString(", ")
      s"array_distinct(transform(sequence(0, size(split($t, ' ')) - $n), " +
        s"i -> concat_ws(' ', $parts)))".replace("ws[", s"split($t, ' ')[")
    }
    s"size(array_intersect(${sh(a)}, ${sh(b)})) / cast(size(array_union(${sh(a)}, ${sh(b)})) as double)"
  }

  test("kernel equals the composed shingle form on corpus text pairs") {
    val t = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .filter(expr("size(split(t, ' ')) >= 3"))
    val pairs = t.select(col("doc_id").as("a_id"), col("t").as("ta"))
      .filter(col("a_id") < 60)
      .crossJoin(t.select(col("doc_id").as("b_id"), col("t").as("tb")))
      .filter(col("a_id") < col("b_id"))
    val diff = pairs.select(
        WordShingleJaccard.wordShingleJaccard(col("ta"), col("tb"), 3).as("native"),
        expr(composed("ta", "tb", 3)).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    diff shouldBe 0L
  }

  test("kernel matches the composed form on generated strings, including repeated spaces") {
    import spark.implicits._
    val rnd = new scala.util.Random(117)
    // repeated spaces exercise split's empty tokens riding into shingles
    val vocab = Seq("the", "a", "of", "und", "la", "", "x1", "世界")
    def mk = Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val df = Seq.fill(300)((mk, mk)).toDF("ta", "tb")
    Seq(2, 3).foreach { n =>
      val diff = df
        .filter(expr(s"size(split(ta, ' ')) >= $n and size(split(tb, ' ')) >= $n"))
        .select(
          WordShingleJaccard.wordShingleJaccard(col("ta"), col("tb"), n).as("native"),
          expr(composed("ta", "tb", n)).as("hof"))
        .filter(!(col("native") <=> col("hof")))
        .count()
      withClue(s"n=$n:") { diff shouldBe 0L }
    }
  }

  test("identical texts score 1.0; too-short texts yield null like 0/0") {
    import spark.implicits._
    val df = Seq(("one two three four", "one two three four"), ("one two", "one two")).toDF("ta", "tb")
    val rows = df.select(WordShingleJaccard.wordShingleJaccard(col("ta"), col("tb"), 3)).collect()
    rows(0).getDouble(0) shouldBe 1.0
    assert(rows(1).isNullAt(0), "shingle sets empty on both sides -> null (0/0)")
  }
}
