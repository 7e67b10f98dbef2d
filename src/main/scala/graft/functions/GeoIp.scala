package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ip2geo enrichment (reference `GeoIpValueProducer`,
  * `DslRecordMapping.java:732-965`; `ip2geo/DatabaseLookupService.java`):
  * re-expressed as a **broadcast range join** against an IP-range dimension
  * table — the mmap'd MaxMind reader becomes a broadcast relation, the
  * per-event lookup becomes a map-side join, and every geo sub-producer is a
  * projected column of the joined dimension row.
  *
  * At 100 TB: the GeoLite-class dim is a few hundred MB — broadcast once per
  * job, zero shuffle on the fact side. Range-join pushdown: the dimension is
  * sorted and small, so Spark's BroadcastNestedLoopJoin with a range
  * predicate is effectively a per-row binary search after AQE; for very hot
  * paths a bucketed prefix join (/16 prefix equality + range residual)
  * turns it into a hash join.
  */
object GeoIp {

  /** Dotted-quad IPv4 → numeric (pure built-ins, codegen'd). */
  def ipv4ToLong(ip: Column): Column = {
    val p = split(ip, "\\.")
    element_at(p, 1).cast("long") * 16777216L +
      element_at(p, 2).cast("long") * 65536L +
      element_at(p, 3).cast("long") * 256L +
      element_at(p, 4).cast("long")
  }

  /** Enrich `df` with the dimension row covering each IP. `dim` must have
    * `ip_start`/`ip_end` (inclusive) long columns; all other dim columns are
    * appended (null when no range matches — the reference's absent-geo
    * semantics, `DslRecordMapping.java:757-769`). Equality on the /16 prefix
    * makes the broadcast join hashable; ranges must not cross /16 borders
    * (standard practice: split dim rows per prefix). */
  def enrich(df: DataFrame, ipCol: String, dim: DataFrame): DataFrame = {
    val ipNum = ipv4ToLong(col(ipCol))
    df.withColumn("__ip_num", ipNum)
      .join(broadcast(dim),
        col("__ip_num") >= col("ip_start") && col("__ip_num") <= col("ip_end"),
        "left")
      .drop("__ip_num")
  }

  /** The reference's full CityResponse producer surface
    * (`DslRecordMapping.java:765-965`): 30 sub-producers + the 2 deprecated
    * proxy-trait flags, in declaration order. Each is a column of the
    * joined dimension row; [[cityResponse]] assembles them into ONE
    * parse-once struct (the reference parses the MaxMind response once and
    * every producer projects from it — same shape as the UA struct). */
  val CityResponseFields: Seq[String] = Seq(
    "city_id", "city_name",
    "continent_code", "continent_id", "continent_name",
    "country_code", "country_id", "country_name",
    "latitude", "longitude", "metro_code", "time_zone",
    "most_specific_subdivision_code", "most_specific_subdivision_id",
    "most_specific_subdivision_name",
    "postal_code",
    "registered_country_code", "registered_country_id",
    "registered_country_name",
    "represented_country_code", "represented_country_id",
    "represented_country_name",
    "subdivision_codes", "subdivision_ids", "subdivision_names",
    "asn", "as_org", "domain", "isp", "organisation",
    "anonymous_proxy", "satellite_provider")

  /** One struct column carrying every geo sub-producer — project fields out
    * of it (`geo.getField("city_name")`) instead of re-joining per field. */
  def cityResponse: Column = struct(CityResponseFields.map(col): _*)

  /** Hash-joinable variant: each dim range is exploded into the /prefixBits
    * blocks it spans, the event side keys on its block, and the range check
    * becomes a residual filter — Spark plans a BroadcastHashJoin (per-row
    * hash probe) instead of a BroadcastNestedLoopJoin (per-row scan of the
    * whole dim). With GeoLite-scale dims (~3M ranges) the NLJ is O(dim) per
    * event and untenable; this is the standard prefix-split. Ranges must
    * not overlap (MaxMind ranges don't), else duplicate matches. */
  def enrichPrefix(df: DataFrame, ipCol: String, dim: DataFrame,
      prefixBits: Int = 24): DataFrame = {
    val shift = 32 - prefixBits
    val expanded = dim.withColumn("__pd",
      explode(sequence(shiftrightunsigned(col("ip_start"), shift),
        shiftrightunsigned(col("ip_end"), shift))))
    df.withColumn("__ip_num", ipv4ToLong(col(ipCol)))
      .withColumn("__p", shiftrightunsigned(col("__ip_num"), shift))
      .join(broadcast(expanded),
        col("__p") === col("__pd") &&
          col("__ip_num") >= col("ip_start") && col("__ip_num") <= col("ip_end"),
        "left")
      .drop("__ip_num", "__p", "__pd")
  }
}
