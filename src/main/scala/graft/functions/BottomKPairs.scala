package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import scala.collection.mutable

/** `bottom_k_pairs(h, v, k)`: aggregate `(h, v)` long pairs into the k
  * lexicographically-smallest DISTINCT pairs, ascending — the KMV
  * (k-minimum-values) sketch primitive. With `h` a uniform content hash
  * (the suite's portable 60-bit md5 prefix) this yields, in ONE bounded
  * mergeable pass:
  *
  *  - a deterministic uniform sample of k rows (h = hash of a unique row
  *    id, v = the sampled measure) → order-statistic estimates whose
  *    every bit is reproducible by any engine that sorts the same hashes
  *    (the d32/q_approx_stats gate oracles replay it in SQL), unlike
  *    `approx_percentile`, whose kept elements depend on partial-merge
  *    order;
  *  - a KMV distinct-count sketch (h = v = hash of the counted key):
  *    duplicates collapse by set semantics, and the k-th smallest of n
  *    distinct uniform 60-bit hashes estimates n ≈ (k-1)·2^60/h_k.
  *
  * Min-k-of-a-set is commutative, associative, and idempotent, so the
  * result is independent of partitioning, merge order, and duplicates.
  *
  * SCALE: the buffer holds at most k pairs per partial aggregate
  * regardless of input size; merge is a bounded set-union re-truncated
  * to k; rows whose pair already exceeds the current k-th pair are
  * rejected in O(log k) without allocation. Null-in-either-column rows
  * are skipped (count(col)'s null discipline).
  */
case class BottomKPairs(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Long, Long)]] {

  require(k > 0, s"k must be positive: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (hash.dataType, value.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (h, v) => TypeCheckResult.TypeCheckFailure(
        s"bottom_k_pairs requires two long columns, got (${h.simpleString}, ${v.simpleString})")
    }

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[(Long, Long)] =
    mutable.TreeSet.empty[(Long, Long)]

  private def add(buffer: mutable.TreeSet[(Long, Long)], p: (Long, Long)): Unit =
    if (buffer.size < k) buffer += p
    else if (Ordering[(Long, Long)].lt(p, buffer.last) && buffer.add(p))
      buffer -= buffer.last

  override def update(buffer: mutable.TreeSet[(Long, Long)], input: InternalRow): mutable.TreeSet[(Long, Long)] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) add(buffer, (h.asInstanceOf[Long], v.asInstanceOf[Long]))
    buffer
  }

  override def merge(buffer: mutable.TreeSet[(Long, Long)], other: mutable.TreeSet[(Long, Long)]): mutable.TreeSet[(Long, Long)] = {
    other.foreach(add(buffer, _))
    buffer
  }

  override def eval(buffer: mutable.TreeSet[(Long, Long)]): Any =
    new GenericArrayData(buffer.iterator.map { case (h, v) =>
      new GenericInternalRow(Array[Any](h, v)): Any
    }.toArray)

  override def serialize(buffer: mutable.TreeSet[(Long, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buffer.size)
    buffer.foreach { case (h, v) => out.writeLong(h); out.writeLong(v) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.TreeSet[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buffer = mutable.TreeSet.empty[(Long, Long)]
    var i = 0
    while (i < n) { buffer += ((in.readLong(), in.readLong())); i += 1 }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKPairs =
    copy(hash = newChildren(0), value = newChildren(1))

  override def prettyName: String = "bottom_k_pairs"
}

object BottomKPairs {
  /** `bottom_k_pairs(h, v, k)` as a Column for `agg` call sites. */
  def bottomKPairs(h: Column, v: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKPairs(ColumnBridge.expression(h), ColumnBridge.expression(v), k)
        .toAggregateExpression())
}
