package graft.sinks

import graft.SparkSpec
import graft.Tables
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.functions._

/** Sink round-trip tests following the reference's read-back pattern
  * (`FileFlusherLocalHdfsTest` / `AvroFileLocator`,
  * `ServerSinkSourceConfigurationTest.java:126-158`). */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def mapped = {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    df.select(
      concat(lit("0:1:p"), col("user_id")).as("partyId"),
      concat(lit("ev"), col("event_id")).as("eventId"),
      unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
      col("event_type"),
      col("value"))
  }

  test("avro file sink: write, atomic publish, read back, empty-partition discard") {
    val dir = java.nio.file.Files.createTempDirectory("avrosink").toString
    // repartition so at least one partition is empty (1000 rows, 8 parts + filter)
    AvroFileSink.write(mapped.filter(col("value") > 190).repartition(8), dir)
    val files = AvroFileSink.readBack(spark, dir)
    assert(files.nonEmpty)
    // reference filename convention
    assert(files.forall(_._1.matches("""\d{14}-divolte-tracking-spark-\d{5}\.avro""")))
    // no partials left behind; no empty container files
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".partial")))
    assert(files.forall(_._2 > 0))
    // total record count survives the round trip
    val expected = mapped.filter(col("value") > 190).count()
    assert(files.map(_._2).sum === expected)
  }

  test("avro file sink: field values survive the round trip") {
    val dir = java.nio.file.Files.createTempDirectory("avrosink2").toString
    val one = mapped.orderBy("eventId").limit(3).coalesce(1)
    AvroFileSink.write(one, dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
      f, new GenericDatumReader[GenericRecord]())
    val recs = Iterator.continually(reader).takeWhile(_.hasNext).map(_.next()).toList
    reader.close()
    val rows = one.collect()
    assert(recs.size === rows.length)
    rows.zip(recs).foreach { case (row, rec) =>
      assert(rec.get("partyId").toString === row.getAs[String]("partyId"))
      assert(rec.get("ts_ms") === row.getAs[Long]("ts_ms"))
      assert(rec.get("value") === row.getAs[Double]("value"))
    }
  }

  test("avro sink: schema evolution — v2 readers resolve v1 files via the null-union default") {
    // the reference's [null,T]+default convention IS its evolution story:
    // a reader with an added optional field must consume old container
    // files, the missing field resolving to null
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("avroevolve").toString
    val v1 = mapped.select("eventId", "partyId", "ts_ms").limit(5).coalesce(1)
    AvroFileSink.write(v1, dir, "v1")
    val v2 = mapped.select("eventId", "partyId", "ts_ms")
      .withColumn("newField", concat(lit("x-"), col("eventId")))
      .limit(5).coalesce(1)
    AvroFileSink.write(v2, dir, "v2")
    val v2Schema = StructType(Seq(
      StructField("eventId", StringType), StructField("partyId", StringType),
      StructField("ts_ms", LongType), StructField("newField", StringType)))
    val back = AvroFileSink.readBackDf(spark, dir, v2Schema)
    assert(back.count() === 10)
    // v1 rows surface with the evolved field absent->null; v2 rows keep it
    assert(back.filter(col("newField").isNull).count() === 5)
    assert(back.filter(col("newField").startsWith("x-")).count() === 5)
  }

  test("kafka frame: key is partyId bytes, value decodes as the record") {
    val df = mapped.limit(5)
    val schema = AvroConversions.toAvroSchema(df.schema)
    val frames = TopicSinks.kafkaFrame(df, "partyId").collect()
    val rows = df.collect()
    frames.zip(rows).foreach { case (frame, row) =>
      assert(new String(frame.getAs[Array[Byte]]("key"), "UTF-8") ===
        row.getAs[String]("partyId"))
      val rec = decodeAvro(frame.getAs[Array[Byte]]("value"), schema)
      assert(rec.get("eventId").toString === row.getAs[String]("eventId"))
      assert(rec.get("event_type").toString === row.getAs[String]("event_type"))
    }
  }

  test("confluent frame: 0x00 + int32-BE schema id + naked body") {
    val df = mapped.limit(2)
    val schema = AvroConversions.toAvroSchema(df.schema)
    val schemaId = 0x01020304
    val frames = TopicSinks.kafkaFrameConfluent(df, "partyId", schemaId).collect()
    frames.foreach { frame =>
      val v = frame.getAs[Array[Byte]]("value")
      assert(v(0) === 0.toByte)
      assert(v.slice(1, 5).toSeq === Seq(1, 2, 3, 4).map(_.toByte))
      val rec = decodeAvro(v.drop(5), schema)
      assert(rec.get("partyId") != null)
    }
  }

  test("pubsub frame: attributes carry ids, ISO timestamp, schema fingerprint") {
    val df = mapped.limit(3)
    val fp = TopicSinks.schemaFingerprint(AvroConversions.toAvroSchema(df.schema))
    val out = TopicSinks.pubsubFrame(df, "partyId", "eventId", "ts_ms").collect()
    out.foreach { m =>
      assert(m.getAs[String]("schemaFingerprint") === fp)
      assert(!m.getAs[String]("schemaFingerprint").contains("=")) // no padding
      assert(m.getAs[String]("timestamp").matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z"""))
      assert(m.getAs[String]("partyIdentifier").startsWith("0:1:p"))
      assert(m.getAs[Array[Byte]]("data").nonEmpty)
    }
  }

  private def decodeAvro(bytes: Array[Byte], schema: Schema): GenericRecord = {
    val decoder = DecoderFactory.get().binaryDecoder(bytes, null)
    new GenericDatumReader[GenericRecord](schema).read(null, decoder)
  }
}
