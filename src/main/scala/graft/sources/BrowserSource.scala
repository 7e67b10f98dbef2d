package graft.sources

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * Design: the query string is parsed ONCE into a multi-value map column and
  * every field projects out of it — the same memoize-then-project shape the
  * reference uses (`DslRecordMapping.java:1024-1045`), and for Spark it keeps
  * the decode a single narrow stage: no shuffle, fully parallel by input
  * partition, scales linearly with input splits at any data size.
  */
object BrowserSource {

  /** Decode a DataFrame with a raw query-string column into the canonical
    * event frame. Extra columns (e.g. remote_host, user_agent) pass through. */
  def decode(raw: DataFrame, queryStringCol: String): DataFrame = {
    val qm = col("__qm")
    def p1(key: String): Column = element_at(element_at(qm, key), 1)
    def flag(key: String): Column = p1(key) === "t"

    raw
      .withColumn("__qm", parseQueryString(col(queryStringCol)))
      .withColumn("corrupt", checksumMismatch(qm))
      .withColumn("partyId", p1("p"))
      .withColumn("sessionId", p1("s"))
      .withColumn("eventId", p1("e"))
      .withColumn("eventSource", lit("browser"))
      .withColumn("eventType", p1("t"))
      .withColumn("newPartyId", flag("n"))
      .withColumn("firstInSession", flag("f"))
      .withColumn("clientTime", base36ToLong(p1("c")))
      .withColumn("partyIdTime", divolteIdTimestamp(p1("p")))
      .withColumn("sessionIdTime", divolteIdTimestamp(p1("s")))
      .withColumn("eventParameters", mincodeToJson(p1("u")))
      .withColumn("browser", struct(
        p1("v").as("pageViewId"),
        p1("l").as("location"),
        p1("r").as("referer"),
        base36ToInt(p1("w")).as("viewportPixelWidth"),
        base36ToInt(p1("h")).as("viewportPixelHeight"),
        base36ToInt(p1("i")).as("screenPixelWidth"),
        base36ToInt(p1("j")).as("screenPixelHeight"),
        base36ToInt(p1("k")).as("devicePixelRatio")))
      .drop("__qm")
  }
}
