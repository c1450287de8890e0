package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `bitmap_or_agg(pos, m)`: aggregate a column of bit positions in
  * `[0, m)` into one m-bit bitmap packed as `array<long>` (m/64 words,
  * little-endian bit order: position p sets bit `p mod 64` of word
  * `p div 64`). OR is commutative, associative, and idempotent, so the
  * result is independent of partitioning, merge order, and duplicate
  * positions — the distributed Bloom-filter BUILD (d62's 100 TB form:
  * the historical corpus's probe positions collapse to m bits in one
  * map-side-combined pass, no distinct, no collect of a position set).
  *
  * SCALE: the buffer is a fixed m/64-long array per partial aggregate
  * regardless of input size; merge is a word-wise OR; serialization is
  * the raw words. Out-of-range positions fail loudly (a silently
  * wrapped bit would corrupt membership answers); nulls are skipped
  * (count(col)'s null discipline).
  */
case class BitmapOrAgg(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64: $numBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_or_agg requires an integral position column, got ${other.simpleString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val p = v match {
        case b: Byte => b.toLong
        case s: Short => s.toLong
        case i: Int => i.toLong
        case l: Long => l
      }
      if (p < 0 || p >= numBits)
        throw new IllegalArgumentException(s"bitmap_or_agg: position $p outside [0, $numBits)")
      buffer(p.toInt >> 6) |= 1L << (p & 63)
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(storageFormat)
    Array.fill(storageFormat.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitmapOrAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "bitmap_or_agg"
}

object BitmapOrAgg {
  /** `bitmap_or_agg(pos, m)` as a Column for `agg` call sites. */
  def bitmapOrAgg(pos: Column, numBits: Int): Column =
    ColumnBridge.column(
      BitmapOrAgg(ColumnBridge.expression(pos), numBits).toAggregateExpression())
}
