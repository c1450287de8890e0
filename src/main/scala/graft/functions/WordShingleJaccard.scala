package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact word-n-shingle Jaccard of two (already lowercased/trimmed)
  * texts in one fused pass — [[NgramJaccard]]'s discipline applied to
  * d2's verification unit. Bit-identical to the composed form over
  * `ws = split(t, " ")`:
  * `size(array_intersect(sa, sb)) / size(array_union(sa, sb))` with
  * `s = array_distinct(transform(sequence(0, size(ws) - n),
  * i -> concat_ws(' ', ws[i], .., ws[i+n-1])))` (pinned by
  * WordShingleJaccardSpec), including split's keep-empty-token regex
  * semantics (limit -1) and the null-on-empty-union convention.
  *
  * Before this kernel the d2 verify join carried each side's
  * MATERIALIZED shingle array — ~3x the document's own bytes shuffled
  * per candidate side, plus a corpus-wide shingle-building pass per
  * join side (two extra full document scans in the optimized plan).
  * The verify join now carries the raw texts and builds the two
  * shingle sets in-task, only for the O(candidates) rows that banding
  * actually emitted.
  *
  * Tokenization contract: the inputs must already be
  * `lower(trim(text))` — the kernel splits on the literal single
  * space exactly like `split(t, " ")` (consecutive spaces yield empty
  * tokens that ride into shingles, as concat_ws keeps empty strings)
  * and performs no case folding of its own, so engine-specific
  * lowercasing stays in the one plan-visible projection both the
  * signature kernel and the oracle share.
  */
case class WordShingleJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n >= 1)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"word_shingle_jaccard requires (string, string), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def shingleSet(s: String): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    // split(t, " ") is a regex split with limit -1: trailing empty
    // tokens are KEPT, exactly like Java's split(" ", -1)
    val ws = s.split(" ", -1)
    var i = 0
    val last = ws.length - n
    val sb = new java.lang.StringBuilder
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      set.add(sb.toString)
      i += 1
    }
    set
  }

  /** Shared by eval and codegen. Returns null when both shingle sets
    * are empty (the 0/0 of the composed form).
    */
  def compute(a: UTF8String, b: UTF8String): Any = {
    val sa = shingleSet(a.toString)
    val sb = shingleSet(b.toString)
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
    val self = ctx.addReferenceObj("wordshinglejaccard", this, classOf[WordShingleJaccard].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $self.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): WordShingleJaccard =
    copy(left = newLeft, right = newRight)
}

object WordShingleJaccard {
  def wordShingleJaccard(a: Column, b: Column, n: Int): Column =
    ColumnBridge.column(WordShingleJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b), n))
}
