package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-based browser source: raw web-server access logs (combined log
  * format) of GET-pixel requests → the canonical event frame. The
  * deployment shape where the reference's HTTP ingress is replaced by log
  * shipping: the same decode semantics applied to
  * `GET /csc-event?<params>` lines at rest.
  *
  * Combined log format:
  * `host - - [ts] "GET /csc-event?QS HTTP/1.1" status size "referer" "ua"`
  *
  * One regex projection + the standard BrowserSource decode — a narrow
  * stage over text splits; scales with input files like any log pipeline.
  */
object AccessLogSource {

  private val LogLine =
    """^(\S+) \S+ \S+ \[([^\]]+)\] "GET [^?]*\?([^ "]*) [^"]*" (\d+) \S+ "([^"]*)" "([^"]*)"$"""

  /** Parse log lines (batch or streaming text source) into decoded events.
    * Unparseable lines are kept with `corrupt=true` and null fields (the
    * reference's flag-not-drop stance). */
  def decode(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val parsed = lines
      .withColumn("remoteHost", regexp_extract(col(lineCol), LogLine, 1))
      .withColumn("qs", regexp_extract(col(lineCol), LogLine, 3))
      .withColumn("httpStatus", nullif(regexp_extract(col(lineCol), LogLine, 4), lit("")).cast("int"))
      .withColumn("headerReferer", nullif(regexp_extract(col(lineCol), LogLine, 5), lit("")))
      .withColumn("userAgentString", nullif(regexp_extract(col(lineCol), LogLine, 6), lit("")))
      .withColumn("remoteHost", nullif(col("remoteHost"), lit("")))
      .drop(lineCol)
    BrowserSource.decode(parsed, "qs")
  }

  def readBatch(spark: SparkSession, path: String): DataFrame =
    decode(spark.read.text(path))

  def readStream(spark: SparkSession, path: String): DataFrame =
    decode(spark.readStream.text(path))
}
