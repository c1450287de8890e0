package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** The stream record envelope (reference KinesisRecord.scala:12-44,
  * SURVEY.md §1.2/§7.5): the payload plus the coordinates that route and
  * order it — partition key (shard routing), sequence number (position
  * within the shard), and the KPL-style sub-sequence for records packed
  * into one aggregate.
  *
  * `sequenceNumber` is a DECIMAL(38,0) rendered as a string: 38 digits
  * exceed both Long (19 digits) and Double's 53-bit mantissa, so ordering
  * MUST compare numerically as a decimal — never lexicographically
  * ("10" < "9" as strings) and never through a double round-trip (which
  * collapses neighboring sequence numbers above 2^53). In Spark that is
  * one cast, [[GraftRecord.sequenceOrder]]: DECIMAL(38,0) is a native
  * Catalyst type that sorts, joins, and window-partitions exactly.
  */
final case class GraftRecord(
    data: Array[Byte],
    partitionKey: String,
    sequenceNumber: String, // DECIMAL(38,0) as string
    subSequenceNumber: Long, // position within a KPL aggregate
    shard: Int,
    arrivalTs: java.sql.Timestamp)

object GraftRecord {

  /** The numeric ordering key for a decimal-string sequence column. */
  def sequenceOrder(sequenceNumber: Column): Column =
    sequenceNumber.cast(DecimalType(38, 0))
}
