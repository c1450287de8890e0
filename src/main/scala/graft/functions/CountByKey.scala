package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import scala.collection.mutable

/** `count_by_key(k)`: aggregate a column of integral keys into a
  * `map<key, count>` — a grouped count WITHOUT a groupBy, usable where
  * Spark only accepts plain aggregate expressions. The use case here is
  * `Dataset.observe`: observed metrics may not group, yet the per-shard
  * consumer gauges (the reference's per-shard `ConsumerStats`, keyed by
  * `ShardConsumerId(stream, app, shardId)` — ShardConsumerId.scala:3-9)
  * need a per-key breakdown of every micro-batch. One expression per
  * batch produces the whole map; the listener bus carries it to
  * [[graft.streaming.GraftStats]] through the standard
  * `QueryProgressEvent.observedMetrics` — no side channel, no
  * accumulator plumbing, works on any streaming or batch Dataset.
  *
  * SCALE: the buffer is one (key -> count) entry per DISTINCT key per
  * partial aggregate — for shard counts that is O(shard count), merged
  * tree-wise like any partial aggregation; the observe pipeline adds no
  * shuffle (CollectMetricsExec aggregates on the driver via accumulator
  * merge). Keys are NOT bounded by the expression itself, so callers
  * aggregate low-cardinality keys (shards, partitions), exactly like the
  * reference's per-shard stats instances.
  *
  * Null keys are skipped (a record with no routing key has no shard
  * gauge to land in), matching count(col)'s null discipline.
  */
case class CountByKey(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_by_key requires an integral key column, got ${other.simpleString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(child.dataType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty[Long, Long]

  private def keyAsLong(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  override def update(buffer: mutable.HashMap[Long, Long], input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = keyAsLong(v)
      buffer.update(k, buffer.getOrElse(k, 0L) + 1L)
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[Long, Long], other: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    other.foreach { case (k, n) => buffer.update(k, buffer.getOrElse(k, 0L) + n) }
    buffer
  }

  override def eval(buffer: mutable.HashMap[Long, Long]): Any = {
    // deterministic key order so equal aggregates render identically
    val keys = buffer.keys.toArray.sorted
    val keyData = child.dataType match {
      case ByteType => new GenericArrayData(keys.map(_.toByte))
      case ShortType => new GenericArrayData(keys.map(_.toShort))
      case IntegerType => new GenericArrayData(keys.map(_.toInt))
      case LongType => new GenericArrayData(keys)
    }
    new ArrayBasedMapData(keyData, new GenericArrayData(keys.map(buffer)))
  }

  override def serialize(buffer: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, n) => out.writeLong(k); out.writeLong(n) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.HashMap[Long, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buffer = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { buffer.update(in.readLong(), in.readLong()); i += 1 }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountByKey =
    copy(child = newChildren.head)

  override def prettyName: String = "count_by_key"
}

object CountByKey {
  /** `count_by_key(key)` as a Column, for `agg`/`observe` call sites. */
  def countByKey(key: Column): Column =
    ColumnBridge.column(CountByKey(ColumnBridge.expression(key)).toAggregateExpression())
}
