package graft.sources

import graft.functions.BrowserDecode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Browser (GET pixel) source decoder — the Spark re-expression of the
  * reference's `ClientSideCookieEventHandler.parseRequest`
  * (`ClientSideCookieEventHandler.java:65-137,148-204`): a raw query string
  * becomes one canonical event row.
  *
  * Wire params (`ClientSideCookieEventHandler.java:67-83`):
  * `p`=partyId `s`=sessionId `v`=pageViewId `e`=eventId `c`=clientTime(b36)
  * `n`=newParty(t/f) `f`=firstInSession(t/f) `l`=location `r`=referer
  * `w`/`h`=viewport(b36) `i`/`j`=screen(b36) `k`=pixelRatio(b36)
  * `t`=eventType `u`=event params (mincode) `x`=checksum(b36 murmur3_32)
  *
  * Design: the whole decode (query-string parse, checksum canonicalization
  * + murmur3, base36, flags, mincode) runs as ONE JVM pass per row
  * ([[graft.functions.BrowserWire]]) returning a single struct that fields
  * project from — the reference's parse-once shape
  * (`DslRecordMapping.java:1024-1045`). A column-expression formulation
  * existed first but its interpreted HOF checksum + per-field map lookups
  * capped throughput at ~8k events/s/core; the one-pass decode exceeds the
  * reference's per-thread rate. Still one narrow stage: no shuffle, scales
  * with input splits.
  */
object BrowserSource {



  /** Decode a DataFrame with a raw query-string column into the canonical
    * event frame. Extra columns (e.g. remote_host, user_agent) pass through. */
  private val decodedFields = Seq(
    "corrupt", "partyId", "sessionId", "eventId", "eventSource", "eventType",
    "newPartyId", "firstInSession", "clientTime", "partyIdTime",
    "sessionIdTime", "eventParameters", "browser")

  def decode(raw0: DataFrame, queryStringCol: String): DataFrame = {
    // Proxy-adjacent peer resolution FIRST (reference Server.java:135-138:
    // the XFF handler wraps every source handler) — a frame carrying an
    // xForwardedFor column gets remoteHost rewritten before any mapping.
    val raw = PeerAddress.rewrite(raw0)
    // exactly two projections: one evaluates the decode UDF once, the next
    // fans the struct out into columns (a withColumn chain would stack one
    // uncollapsible projection per field behind the nondeterministic UDF)
    val decodeCol = ColumnBridge.column(
      BrowserDecode(ColumnBridge.expression(col(queryStringCol))))
    val withStruct = raw.select(col("*"), decodeCol.as("__d"))
    withStruct.select(
      raw.columns.map(col).toIndexedSeq ++
        decodedFields.map(f => col(s"__d.$f").as(f)): _*)
  }
}
