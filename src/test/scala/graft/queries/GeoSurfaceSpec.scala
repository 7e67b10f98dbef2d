package graft.queries

import graft.SparkSpec
import graft.functions.GeoIp
import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The full CityResponse surface: all 32 sub-producer fields (30 current +
  * 2 deprecated proxy flags, `DslRecordMapping.java:765-965`) with the
  * reference's types — including the three subdivision ARRAY producers —
  * and absent-geo semantics for unmatched IPs. */
class GeoSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("CityResponse struct carries all 32 fields with reference types") {
    val df = EnrichQueries.geoEnrichFull(spark, sf)
    // flattened surface: event_id + ip + every producer
    assert(df.columns.toSeq ===
      Seq("event_id", "ip") ++ GeoIp.CityResponseFields)
    assert(GeoIp.CityResponseFields.size === 32)
    // the struct itself (pre-flattening) keeps real typed arrays
    val ev = Tables.events(spark, sf).select(
      col("event_id"),
      concat(lit("10.0."), (col("user_id") % 256).cast("string"), lit("."),
        ((col("user_id") * 7) % 256).cast("string")).as("ip"))
    val dim = EnrichQueries.geoEnrichFull(spark, sf) // force compile path
    assert(dim != null)
    val geoType = GeoIp.cityResponse
    val joined = GeoIp.enrichPrefix(ev,
      "ip", nationDim).withColumn("geo", geoType)
    val st = joined.schema("geo").dataType.asInstanceOf[StructType]
    def t(f: String): DataType = st(f).dataType
    assert(t("city_id") === IntegerType)           // Integer producer
    assert(t("latitude") === DoubleType)           // Double producer
    assert(t("longitude") === DoubleType)
    assert(t("metro_code") === IntegerType)
    assert(t("subdivision_codes") === ArrayType(StringType, false))
    assert(t("subdivision_ids") === ArrayType(IntegerType, false))
    assert(t("subdivision_names") === ArrayType(StringType, false))
    assert(t("anonymous_proxy") === BooleanType)   // deprecated flags kept
    assert(t("satellite_provider") === BooleanType)
    assert(t("time_zone") === StringType)
  }

  test("unmatched IPs produce the reference's absent-geo semantics: all null") {
    val df = EnrichQueries.geoEnrichFull(spark, sf).cache()
    val unmatched = df.filter(col("country_name").isNull)
    assert(unmatched.count() > 0) // user_id % 256 in {254, 255} fall outside
    GeoIp.CityResponseFields.foreach { f =>
      assert(unmatched.filter(col(f).isNotNull).isEmpty, s"field $f")
    }
    // and matched rows populate the null-heavy represented-country only
    // for every 5th nation
    val matched = df.filter(col("country_name").isNotNull)
    assert(matched.filter(col("represented_country_code").isNotNull).count() > 0)
    assert(matched.filter(col("represented_country_code").isNull).count() > 0)
    df.unpersist()
  }

  test("geo enrichment plans as a broadcast HASH join, not a nested loop") {
    val plan = EnrichQueries.geoEnrichFull(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  /** A tiny 2-range dim reusing the production column inventory, for the
    * struct-type assertions (the full dim builder is private). */
  private def nationDim = {
    import spark.implicits._
    val base = Seq((167772160L, 167774759L, 0)).toDF("ip_start", "ip_end", "k")
    val k = col("k")
    val nSub = k % 3 + 1
    val subIdx = sequence(lit(1), nSub)
    base.select(col("ip_start"), col("ip_end"),
      (k * 10 + 1000).as("city_id"),
      lit("City A").as("city_name"),
      lit("AF").as("continent_code"), (k + 6000).as("continent_id"),
      lit("AFRICA").as("continent_name"),
      lit("AL").as("country_code"), (k + 7000).as("country_id"),
      lit("ALGERIA").as("country_name"),
      ((k * 53).cast("double") / 10 - 60).as("latitude"),
      ((k * 91).cast("double") / 10 - 120).as("longitude"),
      (k + 500).as("metro_code"), lit("Zone/A").as("time_zone"),
      lit("S0-1").as("most_specific_subdivision_code"),
      (k + 9001).as("most_specific_subdivision_id"),
      lit("Sub 0 1").as("most_specific_subdivision_name"),
      lit("00000").as("postal_code"),
      lit("RC1").as("registered_country_code"),
      (k + 7001).as("registered_country_id"),
      lit("Nation 1").as("registered_country_name"),
      lit("MIL").as("represented_country_code"),
      (k + 8000).as("represented_country_id"),
      lit("Base 0").as("represented_country_name"),
      transform(subIdx, j => concat(lit("S"), k, lit("-"), j))
        .as("subdivision_codes"),
      transform(subIdx, j => (k * 10 + j + 9000).cast("int"))
        .as("subdivision_ids"),
      transform(subIdx, j => concat(lit("Sub "), k, lit(" "), j))
        .as("subdivision_names"),
      (k + 64512).as("asn"), lit("AS Org 0").as("as_org"),
      lit("algeria.example").as("domain"), lit("ISP 0").as("isp"),
      lit("Org 0").as("organisation"),
      (k % 7 === 0).as("anonymous_proxy"),
      (k % 11 === 0).as("satellite_provider"))
  }
}
