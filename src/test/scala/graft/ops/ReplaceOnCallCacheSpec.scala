package graft.ops

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the ReplaceOnCallCache ownership contract (r11 ADVICE): the slot
  * unpersists only frames IT persisted — a caller-persisted plan adopted
  * into the slot survives replacement — while repeat-run adoptions of the
  * slot's own earlier persist keep ownership so long sessions still hold
  * at most one slot-owned cache.
  */
class ReplaceOnCallCacheSpec extends AnyFunSuite with SparkSpec with Matchers {
  import org.apache.spark.sql.functions._

  private def freshDf(tag: Int) = {
    import spark.implicits._
    (1 to 10).toDF("v").withColumn("t", lit(tag))
  }

  test("a caller-owned persist survives slot replacement; slot-owned persists do not") {
    val slot = new ReplaceOnCallCache
    val callerOwned = freshDf(1).persist(StorageLevel.MEMORY_AND_DISK)
    callerOwned.count()
    slot.register(callerOwned) // adopted, NOT owned
    val slotOwned = slot.register(freshDf(2)) // replaces: must not touch caller's
    callerOwned.storageLevel should not be StorageLevel.NONE
    slotOwned.storageLevel should not be StorageLevel.NONE
    slot.register(freshDf(3)) // replaces the slot-owned frame: evicted
    slotOwned.storageLevel shouldBe StorageLevel.NONE
    slot.release()
    callerOwned.unpersist(blocking = true)
  }

  test("a repeat-run adoption keeps ownership: the third call still evicts the shared plan") {
    val slot = new ReplaceOnCallCache
    val first = slot.register(freshDf(7)) // slot persists: owned
    first.count()
    val repeat = slot.register(freshDf(7)) // same plan, new object: adopted, stays OWNED
    repeat.storageLevel should not be StorageLevel.NONE
    slot.register(freshDf(8)) // different plan: the shared entry must be evicted
    first.storageLevel shouldBe StorageLevel.NONE
    slot.release()
  }
}
