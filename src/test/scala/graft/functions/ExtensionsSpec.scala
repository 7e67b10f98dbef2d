package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL registration surface (GraftExtensions): every custom expression
  * is callable by name from `spark.sql`, and SQL results agree with the
  * Column API. */
class ExtensionsSpec extends SparkSpec {

  test("scalar codecs are SQL-callable and agree with the Column API") {
    assert(spark.sql("SELECT base36_to_long('z') v").head.getLong(0) === 35L)
    assert(spark.sql("SELECT base36_to_int('10') v").head.getInt(0) === 36)
    assert(spark.sql("SELECT base36_to_long('not base36!') v").head.isNullAt(0))

    val viaSql = spark.sql("SELECT murmur3_utf8('divolte') v").head.getInt(0)
    val viaCol = spark.range(1)
      .select(GraftFunctions.murmur3Utf8(lit("divolte")).as("v")).head.getInt(0)
    assert(viaSql === viaCol)

    val sh = spark.sql("SELECT simhash64('a b a c') v").head.getLong(0)
    val shCol = spark.range(1)
      .select(GraftFunctions.simhash64(lit("a b a c")).as("v")).head.getLong(0)
    assert(sh === shCol)

    // ewma_fold: newest weighs 1/2 -> (1000/4 + 3000/2) / (3/4)
    val ew = spark.sql("SELECT ewma_fold(array(1000L, 3000L)) v").head.getDouble(0)
    val ewCol = spark.range(1)
      .select(GraftFunctions.ewmaFold(array(lit(1000L), lit(3000L))).as("v"))
      .head.getDouble(0)
    assert(ew === ewCol && ew === 7000.0 / 3)
    assert(spark.sql("SELECT ewma_fold(CAST(array() AS ARRAY<BIGINT>)) v")
      .head.isNullAt(0))
  }

  test("struct producers: uri_parse / parse_query_string / mincode from SQL") {
    val row = spark.sql(
      "SELECT uri_parse('https://shop.example:8443/a/b?x=1&x=2#f') u").select(
      col("u.scheme"), col("u.host"), col("u.port"), col("u.rawQuery")).head
    assert(row.getString(0) === "https")
    assert(row.getString(1) === "shop.example")
    assert(row.getInt(2) === 8443)
    assert(row.getString(3) === "x=1&x=2")

    val qs = spark.sql(
      "SELECT element_at(parse_query_string('a=1&a=2&b'), 'a') v").head.getSeq[String](0)
    assert(qs === Seq("1", "2"))

    val mc = spark.sql("SELECT mincode_to_json('(dk!2s!)') v").head.getString(0)
    val mcCol = spark.range(1)
      .select(GraftFunctions.mincodeToJson(lit("(dk!2s!)")).as("v")).head.getString(0)
    assert(mc === mcCol)
  }

  test("json_path_query takes a plan-time literal path; non-literal fails analysis") {
    assert(spark.sql(
      """SELECT json_path_query('{"a":{"b":[1,2,3]}}', '$.a.b[-1]') v""")
      .head.getString(0) === "3")
    val err = intercept[Exception] {
      spark.sql("SELECT json_path_query('{}', concat('$', rand())) v").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("vector math and digests from SQL") {
    assert(spark.sql(
      "SELECT dot_long_arrays(array(1L, 2L, 3L), array(4L, 5L, 6L)) v")
      .head.getLong(0) === 32L)
    assert(spark.sql(
      "SELECT scale_floats(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT))) v")
      .head.getSeq[Long](0) === Seq(5000000L, -2500000L))

    val viaSql = spark.sql("SELECT digest_pieces('SHA-256', 'a', NULL, 'b') v")
      .head.getAs[Array[Byte]](0)
    val viaCol = spark.range(1)
      .select(GraftFunctions.digest("SHA-256", lit("a"), lit(null), lit("b")).as("v"))
      .head.getAs[Array[Byte]](0)
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("vector math type/null discipline: bad types and NULL literals fail early") {
    // mismatched lengths -> NULL (zip_with/aggregate parity), not garbage
    assert(spark.sql(
      "SELECT dot_long_arrays(array(1L, 2L, 3L), array(1L)) v").head.isNullAt(0))
    // array<double> is rejected at analysis, not silently misread as floats
    val typeErr = intercept[Exception] {
      spark.sql("SELECT scale_floats(array(0.5, 0.25)) v").collect()
    }
    assert(typeErr.getMessage.toLowerCase.contains("type"))
    // NULL algorithm literal fails at registration/analysis, not execution
    val nullErr = intercept[Exception] {
      spark.sql("SELECT digest_pieces(CAST(NULL AS STRING), 'a') v").collect()
    }
    assert(nullErr.getMessage.contains("NULL"))
  }

  test("hilbert_index from SQL agrees with the Column API and propagates null") {
    val viaSql = spark.sql("SELECT hilbert_index(12345L, 54321L) v").head.getLong(0)
    val viaCol = spark.range(1)
      .select(GraftFunctions.hilbertIndex(lit(12345L), lit(54321L)).as("v"))
      .head.getLong(0)
    assert(viaSql === viaCol && viaSql === Hilbert.index(12345L, 54321L))
    assert(spark.sql("SELECT hilbert_index(CAST(NULL AS BIGINT), 1L) v")
      .head.isNullAt(0))
  }

  test("round-7 additions: xff / unicode / gear chunks / t-digest from SQL") {
    assert(spark.sql(
      "SELECT xff_peer_address('10.0.0.1, 203.0.113.9') v").head.getString(0)
      === "203.0.113.9")
    assert(spark.sql("SELECT xff_peer_address('not-an-ip') v").head.isNullAt(0))

    val nfc = spark.sql("SELECT unicode_normalize('café', 'NFC') v")
      .head.getString(0)
    assert(nfc === "café")
    val formErr = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NFX') v").collect()
    }
    assert(formErr.getMessage.contains("NFX"))

    // gear_chunks tiles the input; SQL row agrees with the Column API
    val g = spark.sql(
      "SELECT aggregate(gear_chunks('the quick brown fox jumps over the lazy dog'), " +
        "0, (a, c) -> a + c.len) v").head.getInt(0)
    assert(g === 43)

    // t-digest quantile over a hand-built two-centroid digest
    val td = spark.sql(
      "SELECT tdigest_quantile(array(1.0D, 1.0D, 3.0D, 1.0D), 0.5) v")
      .head.getDouble(0)
    assert(td === 2.0)
    val qErr = intercept[Exception] {
      spark.sql("SELECT tdigest_quantile(array(1.0D, 1.0D), 1.5) v").collect()
    }
    assert(qErr.getMessage.contains("quantile"))
  }

  test("sketch aggregators are SQL-callable: tdigest two-level, hll") {
    spark.range(0, 1000).selectExpr("id % 4 AS g", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("sketch_probe")
    // two-level rollup entirely in SQL: per-group digests -> re-merged
    val p50 = spark.sql(
      """SELECT tdigest_quantile(tdigest_merge_agg(dig), 0.5) v FROM
        |  (SELECT g, tdigest_agg(v) AS dig FROM sketch_probe GROUP BY g)""".stripMargin)
      .head.getDouble(0)
    assert(math.abs(p50 - 499.5) < 25, s"p50=$p50")
    val hll = spark.sql(
      "SELECT hll_distinct_agg(CAST(id AS STRING)) v FROM range(0, 2000)")
      .head.getDouble(0)
    assert(math.abs(hll - 2000) / 2000 < 0.1, s"hll=$hll")
  }

  test("string-similarity expressions are SQL-callable and agree with the Column API") {
    // unrestricted DL: 'ca' -> 'abc' is 2 (transpose then insert) where
    // the restricted OSA variant says 3 -- the SQL name must bind the
    // unrestricted expression the linkage operators use
    assert(spark.sql("SELECT damerau_levenshtein('ca', 'abc') v")
      .head.getInt(0) === 2)
    val jwSql = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') v")
      .head.getDouble(0)
    val jwCol = spark.range(1)
      .select(GraftFunctions.jaroWinkler(lit("MARTHA"), lit("MARHTA")).as("v"))
      .head.getDouble(0)
    assert(jwSql === jwCol)
    assert(math.abs(jwSql - 0.9611111) < 1e-6)
  }
}
