package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `cms_agg(h, w, width, depth)`: aggregate a column of nonnegative
  * 60-bit hashes (weighted by `w` >= 0) into one Count-Min sketch
  * (Cormode & Muthukrishnan 2005) packed row-major as `array<long>` of
  * `depth * width` counters: row j's bucket for hash h is the j-th
  * log2(width)-bit slice `(h >> (log2(width)*j)) & (width-1)`, and the
  * point estimate for h is the MINIMUM of its `depth` counters — an
  * overestimate, never an underestimate. Addition is commutative and
  * associative, and the buckets are pure integer slices of the hash, so
  * the sketch — including every collision — is independent of
  * partitioning and merge order: a DuckDB oracle replays it exactly
  * (unlike Misra-Gries-style heavy-hitter state, whose content depends
  * on arrival order).
  *
  * This is the frequency twin of [[BitmapOrAgg]] (membership): the
  * distributed heavy-hitter/frequency BUILD for d72/d73 — a token
  * stream of any size collapses to `depth * width` int64 counters in
  * one map-side-combined pass, no vocabulary shuffle, no collect of a
  * count table.
  *
  * SCALE: the buffer is a fixed depth*width-long array per partial
  * aggregate regardless of input size; merge is element-wise addition;
  * serialization is the raw counters. Negative weights fail loudly (a
  * CMS with deletions loses its one-sided error bound); null hash or
  * weight rows are skipped (count(col)'s null discipline). Counters are
  * int64: overflow would need 2^63 total weight, i.e. more tokens than
  * any corpus.
  *
  * Geometry contract: `width` a power of two, `depth >= 1`, and
  * `depth * log2(width) <= 60` so every row's slice reads disjoint bits
  * of the 60-bit md5-prefix hashes this engine uses (rows are then
  * pairwise-independent in the hash bits, the CMS requirement).
  */
case class CmsAgg(
    hash: Expression,
    weight: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0 && (width & (width - 1)) == 0, s"width must be a power of two: $width")
  require(depth >= 1, s"depth must be >= 1: $depth")
  private val bits = java.lang.Integer.numberOfTrailingZeros(width)
  require(depth * bits <= 60,
    s"depth * log2(width) must be <= 60 (the hash width): $depth * $bits")

  override def checkInputDataTypes(): TypeCheckResult = (hash.dataType, weight.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (h, w) => TypeCheckResult.TypeCheckFailure(
      s"cms_agg requires (bigint hash, bigint weight), got (${h.simpleString}, ${w.simpleString})")
  }

  override def children: Seq[Expression] = Seq(hash, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val h = hash.eval(input)
    val w = weight.eval(input)
    if (h != null && w != null) {
      val hv = h.asInstanceOf[Long]
      val wv = w.asInstanceOf[Long]
      if (hv < 0)
        throw new IllegalArgumentException(s"cms_agg: negative hash $hv (expected a 60-bit prefix)")
      if (wv < 0)
        throw new IllegalArgumentException(s"cms_agg: negative weight $wv (no deletions)")
      var j = 0
      while (j < depth) {
        buffer(j * width + ((hv >>> (bits * j)) & (width - 1)).toInt) += wv
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(hash = newChildren(0), weight = newChildren(1))

  override def prettyName: String = "cms_agg"
}

object CmsAgg {
  /** `cms_agg(h, w, width, depth)` as a Column for `agg` call sites. */
  def cmsAgg(hash: Column, weight: Column, width: Int, depth: Int): Column =
    ColumnBridge.column(
      CmsAgg(ColumnBridge.expression(hash), ColumnBridge.expression(weight),
        width, depth).toAggregateExpression())
}
