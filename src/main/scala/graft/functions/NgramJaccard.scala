package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact character-n-gram Jaccard of two strings in one fused pass:
  * |distinct grams(a) ∩ distinct grams(b)| / |distinct grams(a) ∪ b's|,
  * identical to the composed
  * `size(array_intersect(ga, gb)) / size(array_union(ga, gb))` over
  * `transform(sequence(...), i -> substring(t, i, n))` gram arrays
  * (pinned by NgramJaccardSpec), with the same null-on-empty-union
  * convention as Spark's double division by zero.
  *
  * The composed form materializes both gram ARRAYS as join payload — for
  * candidate verification that means shuffling ~n·len bytes per pair side
  * (the arrays dwarf the documents). This kernel lets the verify join
  * carry only the raw texts and build the two hash sets in-task: the
  * shuffle payload drops by ~n× and nothing intermediate is allocated
  * per-pair but the sets themselves.
  *
  * Grams are enumerated over UTF-16 chars; for BMP text this equals the
  * substring/code-point definition the oracle uses (the fixture corpus is
  * BMP-only, and the parity spec runs real corpus text).
  */
case class NgramJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n >= 1)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"ngram_jaccard requires (string, string), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def gramSet(s: String): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    var i = 0
    val last = s.length - n
    while (i <= last) { set.add(s.substring(i, i + n)); i += 1 }
    set
  }

  /** Shared by eval and codegen. Returns null when both gram sets are
    * empty (the 0/0 of the composed form).
    */
  def compute(a: UTF8String, b: UTF8String): Any = {
    val sa = gramSet(a.toString)
    val sb = gramSet(b.toString)
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) null else inter.toDouble / union
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ngramjaccard", this, classOf[NgramJaccard].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $self.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NgramJaccard =
    copy(left = newLeft, right = newRight)
}

object NgramJaccard {
  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    ColumnBridge.column(NgramJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b), n))
}
