package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.FunctionRegistryBridge
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

import graft.functions._

/** SQL surface for the native kernels: registered via
  * `spark.sql.extensions=graft.GraftExtensions` (the standard
  * SparkSessionExtensions deployment hook — works from spark-submit
  * conf with no code change), so `spark.sql("SELECT cosine_sim(a, b)
  * ...")` and the Column API hit the SAME Catalyst expressions, codegen
  * included. Static parameters (band shapes, seeds, moduli) are passed
  * as SQL literals (foldable expressions — `array(...)` of constants
  * folds too) and extracted at resolution time, mirroring how Spark's
  * own parameterized builtins (e.g. `approx_count_distinct`) take
  * constant arguments.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  type Builder = Seq[Expression] => Expression

  private def fail(fn: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$fn: $msg")

  private def longArg(fn: String, arg: String)(e: Expression): Long =
    if (e.foldable && (e.dataType == LongType || e.dataType == IntegerType))
      e.eval() match { case i: Int => i.toLong; case l: Long => l }
    else fail(fn, s"$arg must be an integer literal, got $e")

  private def intArg(fn: String, arg: String)(e: Expression): Int =
    longArg(fn, arg)(e).toInt

  private def longsArg(fn: String, arg: String)(e: Expression): Seq[Long] =
    if (e.foldable) e.dataType match {
      case ArrayType(LongType, _) =>
        e.eval().asInstanceOf[ArrayData].toLongArray().toSeq
      case ArrayType(IntegerType, _) =>
        e.eval().asInstanceOf[ArrayData].toIntArray().map(_.toLong).toSeq
      case t => fail(fn, s"$arg must be an integer array literal, got type $t")
    } else fail(fn, s"$arg must be an integer array literal, got $e")

  private def arity(fn: String, args: Seq[Expression], n: Int*): Unit =
    if (!n.contains(args.length))
      fail(fn, s"expects ${n.mkString(" or ")} arguments, got ${args.length}")

  private def fn(name: String, clazz: Class[_])(builder: Builder): (String, ExpressionInfo, Builder) =
    (name, new ExpressionInfo(clazz.getCanonicalName, name), builder)

  /** Every registered function: (SQL name, info, builder). */
  val all: Seq[(String, ExpressionInfo, Builder)] = Seq(
    fn("cosine_sim", classOf[CosineSimilarity]) { args =>
      arity("cosine_sim", args, 2)
      CosineSimilarity(args(0), args(1))
    },
    fn("ngram_jaccard", classOf[NgramJaccard]) { args =>
      arity("ngram_jaccard", args, 3)
      NgramJaccard(args(0), args(1), intArg("ngram_jaccard", "n")(args(2)))
    },
    fn("simhash_bits", classOf[SimHashBits]) { args =>
      arity("simhash_bits", args, 2)
      SimHashBits(args(0), intArg("simhash_bits", "bits")(args(1)))
    },
    fn("md5_prefix64", classOf[Md5Prefix64]) { args =>
      arity("md5_prefix64", args, 1)
      Md5Prefix64(args(0))
    },
    fn("rolling_hash", classOf[RollingHash]) { args =>
      arity("rolling_hash", args, 1, 3)
      if (args.length == 1) RollingHash(args(0), 31L, 1000000007L)
      else RollingHash(args(0),
        longArg("rolling_hash", "base")(args(1)),
        longArg("rolling_hash", "mod")(args(2)))
    },
    fn("srp_signature", classOf[SrpSignature]) { args =>
      arity("srp_signature", args, 5)
      SrpSignature(args(0),
        intArg("srp_signature", "bands")(args(1)),
        intArg("srp_signature", "bitsPerBand")(args(2)),
        intArg("srp_signature", "dim")(args(3)),
        longArg("srp_signature", "seed")(args(4)))
    },
    fn("minhash_signature", classOf[MinHashSignature]) { args =>
      arity("minhash_signature", args, 4)
      MinHashSignature(args(0),
        longsArg("minhash_signature", "seedsA")(args(1)),
        longsArg("minhash_signature", "seedsB")(args(2)),
        longArg("minhash_signature", "p")(args(3)))
    },
    fn("chargram_minhash", classOf[CharGramMinHash]) { args =>
      arity("chargram_minhash", args, 5)
      CharGramMinHash(args(0),
        intArg("chargram_minhash", "n")(args(1)),
        longsArg("chargram_minhash", "seedsA")(args(2)),
        longsArg("chargram_minhash", "seedsB")(args(3)),
        longArg("chargram_minhash", "p")(args(4)))
    },
    fn("wordshingle_minhash", classOf[WordShingleMinHash]) { args =>
      arity("wordshingle_minhash", args, 5)
      WordShingleMinHash(args(0),
        intArg("wordshingle_minhash", "shingleWords")(args(1)),
        longsArg("wordshingle_minhash", "seedsA")(args(2)),
        longsArg("wordshingle_minhash", "seedsB")(args(3)),
        longArg("wordshingle_minhash", "p")(args(4)))
    },
    fn("word_window_md5", classOf[WordWindowMd5]) { args =>
      arity("word_window_md5", args, 2)
      WordWindowMd5(args(0), intArg("word_window_md5", "w")(args(1)))
    },
    fn("winnow_md5", classOf[WinnowMd5]) { args =>
      arity("winnow_md5", args, 3)
      WinnowMd5(args(0),
        intArg("winnow_md5", "gramW")(args(1)),
        intArg("winnow_md5", "winW")(args(2)))
    },
    fn("bitmap_or_agg", classOf[BitmapOrAgg]) { args =>
      arity("bitmap_or_agg", args, 2)
      BitmapOrAgg(args(0), intArg("bitmap_or_agg", "numBits")(args(1)))
        .toAggregateExpression()
    },
    fn("bottom_k_pairs", classOf[BottomKPairs]) { args =>
      arity("bottom_k_pairs", args, 3)
      BottomKPairs(args(0), args(1), intArg("bottom_k_pairs", "k")(args(2)))
        .toAggregateExpression()
    },
    fn("cms_agg", classOf[CmsAgg]) { args =>
      arity("cms_agg", args, 4)
      CmsAgg(args(0), args(1),
        intArg("cms_agg", "width")(args(2)),
        intArg("cms_agg", "depth")(args(3)))
        .toAggregateExpression()
    })

  /** Programmatic registration into an already-running session (the
    * extensions config only applies at session build time).
    */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      FunctionRegistryBridge.register(spark, name, info, builder)
    }
}
