package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => asize}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class WordWindowMd5Spec extends AnyFunSuite with SparkSpec with Matchers {

  /** The composed form the kernel replaces (d28's window-hash step). */
  private def composed(w: Int) =
    s"transform(sequence(0, size(split(t, ' ')) - $w), i -> " +
      "cast(conv(substring(md5(concat_ws(' ', " +
      s"slice(split(t, ' '), i + 1, $w))),1,15),16,10) as long))"

  test("native kernel is bit-identical to the composed transform/slice/md5 form on the corpus") {
    val df = graft.Tables.documents(spark, sf001)
      .select(lower(trim(col("text"))).as("t"))
      .filter(asize(split(col("t"), " ")) >= 8)
    val diff = df.select(
        WordWindowMd5.wordWindowMd5(col("t"), 8).as("native"),
        expr(composed(8)).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    diff shouldBe 0L
  }

  test("kernel matches the composed form on adversarial strings: doubled spaces, unicode, w=1..3") {
    import spark.implicits._
    val rows = Seq(
      "a b c d e",
      "a  b c", // doubled space -> EMPTY token, windows must still align
      " leading and trailing ", // split keeps the empty edge tokens
      "ä ö 世 界 é λ", // multi-byte tokens: byte-offset math must be exact
      "x", "x y",
      "same same same same same")
    val df = rows.map(Tuple1(_)).toDF("t")
    for (w <- 1 to 3) {
      val diff = df
        .filter(asize(split(col("t"), " ")) >= w)
        .select(WordWindowMd5.wordWindowMd5(col("t"), w).as("native"),
          expr(composed(w)).as("hof"))
        .filter(!(col("native") <=> col("hof")))
        .count()
      withClue(s"w=$w: ") { diff shouldBe 0L }
    }
  }

  test("fewer tokens than the window yields an empty array; null passes through") {
    import spark.implicits._
    val df = Seq(Tuple1("a b")).toDF("t")
    df.select(WordWindowMd5.wordWindowMd5(col("t"), 3)).head().getSeq[Long](0) shouldBe empty
    assert(df.select(WordWindowMd5.wordWindowMd5(lit(null).cast("string"), 3)).head().isNullAt(0))
  }
}
