package graft.state

import graft.functions.Murmur3
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

/** Probabilistic duplicate flagging with the reference's slot-memory
  * semantics (`ShortTermDuplicateMemory.java:108-178`): murmur3_128 over the
  * event's identifying properties (UTF-16, Guava `putUnencodedChars`), slot
  * chosen by the byte-swapped low int of h1 mod slot count, 64-bit signature
  * from byte-swapped h2; compare-and-overwrite — a FLAG, not a filter, and
  * deliberately approximate (false positives on slot collisions after
  * overwrite, exactly like the reference).
  *
  * Distribution model mirrors the reference's: events are partitioned by
  * partyId (the reference's per-thread affinity,
  * `ProcessingPool.java:87-92`) and processed in timestamp order with one
  * slot array per partition (per-thread memory,
  * `IncomingRequestProcessor.java:150-151`). At scale this is a single
  * keyed repartition plus a narrow per-partition pass over sorted data.
  */
object DuplicateMemory {

  /** Slot/signature derivation (bit-parity with the reference). */
  def slotAndSignature(slotCount: Int, properties: String*): (Int, Long) = {
    val (h1, h2) = Murmur3.hash128x64Utf16(properties)
    val slotSelector = Integer.reverseBytes((h1 & 0xffffffffL).toInt)
    val signature = java.lang.Long.reverseBytes(h2)
    ((slotSelector & Int.MaxValue) % slotCount, signature)
  }

  /** Flag probable duplicates. Appends a `duplicate` boolean column.
    *
    * @param keyCols   identifying properties, hashed in order (the reference
    *                  uses partyId, sessionId, eventId —
    *                  `IncomingRequestProcessor.java:150-151`)
    * @param orderCol  processing order within a party (arrival time)
    * @param slotCount slots per partition (reference default 1M/thread)
    */
  def flagDuplicates(df: DataFrame, keyCols: Seq[String], partitionCol: String,
                     orderCol: String, slotCount: Int = 1 << 20): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("duplicate", BooleanType, nullable = false))
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val partitioned = df
      .repartition(col(partitionCol))
      .sortWithinPartitions(col(partitionCol), col(orderCol))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    partitioned.mapPartitions { rows =>
      val memory = new Array[Long](slotCount) // one slot array per partition
      rows.map { row =>
        val props = keyIdx.map(i => String.valueOf(row.get(i)))
        val (slot, signature) = slotAndSignature(slotCount, props: _*)
        val dup = memory(slot) == signature
        memory(slot) = signature
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ dup)
      }
    }(enc)
  }
}
