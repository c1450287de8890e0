package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the native PqArgmin kernels bit-identical to the composed
  * higher-order-function forms they replaced in r16 (the forms the
  * DuckDB oracle replays): sequential squared-distance accumulation in
  * dimension order, distance ties to the LOWEST cid, sparse/unsorted
  * cid lists, and the 4-bit packed code key.
  */
class PqArgminSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val SubDim = 8
  private val M = 8

  /** The composed argmin this round's kernel replaced (verbatim from the
    * pre-r16 VectorOps.nearestCidLit). */
  private def composedArgmin(centroids: Seq[(Int, Seq[Double])], vcol: Column): Column = {
    val cents = typedlit(centroids.sortBy(_._1).map { case (cid, cv) => (cid, cv) })
    array_min(transform(cents, c =>
      struct(
        aggregate(zip_with(vcol, c.getField("_2"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d"),
        c.getField("_1").as("cid")))).getField("cid")
  }

  private def randBooks(rnd: scala.util.Random, k: Int): Seq[Seq[(Int, Seq[Double])]] =
    (0 until M).map { m =>
      // sparse, shuffled cid lists: dropped-cluster gaps and builder-side
      // sorting are part of the contract
      rnd.shuffle((0 until 16).toList).take(k).map { cid =>
        (cid, Seq.fill(SubDim)(math.rint(rnd.nextGaussian() * 1e6) / 1e6))
      }
    }

  private def vectors(rnd: scala.util.Random, n: Int, dim: Int) =
    Seq.fill(n)(Seq.fill(dim)(math.rint(rnd.nextGaussian() * 1e6) / 1e6))

  test("pqCodes == the composed per-subspace argmin array, including tie cids") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val books = randBooks(rnd, 13)
    // inject exact duplicate centroids under different cids into book 3:
    // the tie must resolve to the lower cid in both forms
    val dup = books(3).head._2
    val tieBooks = books.updated(3, (14, dup) +: (2, dup) +: books(3).drop(1))
    val df = vectors(rnd, 400, M * SubDim).toDF("v")
    val composed = array(tieBooks.zipWithIndex.map { case (cb, m) =>
      composedArgmin(cb, slice(col("v"), m * SubDim + 1, SubDim)) }: _*)
    val diff = df.select(
        PqArgmin.pqCodes(tieBooks, SubDim, col("v")).as("native"),
        composed.as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    diff shouldBe 0L
  }

  test("packedCodeKey == the composed sum of shifted casts") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val books = randBooks(rnd, 16)
    val df = vectors(rnd, 300, M * SubDim).toDF("v")
    val composed = books.zipWithIndex.map { case (cb, m) =>
      composedArgmin(cb, slice(col("v"), m * SubDim + 1, SubDim)).cast("long") *
        lit(1L << (4 * m))
    }.reduce(_ + _)
    val diff = df.select(
        PqArgmin.packedCodeKey(books, SubDim, col("v")).as("native"),
        composed.as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    diff shouldBe 0L
  }

  test("nearestCell == the composed full-dim argmin on a coarse centroid table") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 64
    val cents = (0 until 5).map(cid =>
      (cid, Seq.fill(dim)(math.rint(rnd.nextGaussian() * 1e6) / 1e6)))
    val df = vectors(rnd, 500, dim).toDF("v")
    val diff = df.select(
        PqArgmin.nearestCell(cents, col("v")).as("native"),
        composedArgmin(cents, col("v")).as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    diff shouldBe 0L
  }

  test("subCid dispatches on m like the when-chain; out-of-range m is null") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val books = randBooks(rnd, 16)
    val df = vectors(rnd, 200, SubDim).toDF("sv")
      .withColumn("m", (pmod(xxhash64(col("sv")), lit(M)).cast("int")))
    val whenChain = (1 until M).foldLeft(
      when(col("m") === 0, composedArgmin(books(0), col("sv")))) { (acc, m) =>
      acc.when(col("m") === m, composedArgmin(books(m), col("sv")))
    }
    val diff = df.select(
        PqArgmin.subCid(books, SubDim, col("m"), col("sv")).as("native"),
        whenChain.as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    diff shouldBe 0L
    val oob = df.limit(5).select(
      PqArgmin.subCid(books, SubDim, lit(M).cast("int"), col("sv")).as("native"))
    oob.filter(col("native").isNotNull).count() shouldBe 0L
  }

  test("adcScore == the composed aggregate/zip_with/element_at fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(300)((
      Seq.fill(M)(rnd.nextInt(16)),
      Seq.fill(M)(Seq.fill(16)(math.rint(rnd.nextGaussian() * 1e6) / 1e6))))
    val df = rows.toDF("codes", "tabs")
      .select(col("codes").cast("array<int>").as("codes"), col("tabs"))
    val composed = aggregate(zip_with(col("codes"), col("tabs"),
      (c, t) => element_at(t, c + 1)), lit(0.0), (acc, x) => acc + x)
    val diff = df.select(
        PqArgmin.adcScore(col("codes"), col("tabs")).as("native"),
        composed.as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    diff shouldBe 0L
    // out-of-range codes are unreachable from the encoder (ADC tables are
    // dense in cid); the kernel degrades to null where the composed ANSI
    // element_at would throw — pin the null, not an engine error
    val oob = df.limit(3).select(
      PqArgmin.adcScore(typedlit(Seq(16)), col("tabs")).as("native"))
    oob.filter(col("native").isNotNull).count() shouldBe 0L
  }

  test("null input vector yields null codes") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val books = randBooks(rnd, 16)
    val df = Seq(Option.empty[Seq[Double]]).toDF("v")
    df.select(PqArgmin.pqCodes(books, SubDim, col("v")).as("c"))
      .filter(col("c").isNotNull).count() shouldBe 0L
  }
}
