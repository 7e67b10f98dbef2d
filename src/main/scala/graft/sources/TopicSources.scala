package graft.sources

import graft.sinks.AvroConversions
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Topic SOURCE decoders — the consume side of [[graft.sinks.TopicSinks]]:
  * a Kafka-shaped frame (`key`/`value` binary columns, as produced by
  * `spark.readStream.format("kafka")` or the sink tests) back into typed
  * rows. Handles both naked Avro values and Confluent-framed values
  * (0x00 magic + int32-BE schema id + body).
  *
  * The reference consumes its own Kafka output downstream
  * (`README.md:27-33`); this closes that loop natively so a graft job can
  * read what another graft job (or the reference itself) published.
  */
object TopicSources {

  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Schema]()
  private def cachedSchema(json: String): Schema =
    schemaCache.computeIfAbsent(json, j => new Schema.Parser().parse(j))

  /** Decode the `value` binary column as Avro into a struct column
    * `record`, dropping the wire frame. `confluent=true` strips the 5-byte
    * header first (and exposes the embedded schema id). */
  def decodeKafkaFrame(frames: DataFrame, recordSchema: StructType,
                       confluent: Boolean = false): DataFrame = {
    val avroSchemaJson = AvroConversions.toAvroSchema(recordSchema).toString
    val dec = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(value: Array[Byte]): Row = {
        val schema = cachedSchema(avroSchemaJson)
        val body = if (confluent) java.util.Arrays.copyOfRange(value, 5, value.length) else value
        val decoder = DecoderFactory.get().binaryDecoder(body, null)
        val rec = new GenericDatumReader[GenericRecord](schema).read(null, decoder)
        fromRecord(rec, recordSchema)
      }
    }, recordSchema)
    val withId =
      if (confluent)
        frames.withColumn("schemaId",
          expr("cast(conv(hex(substring(value, 2, 4)), 16, 10) as int)"))
      else frames
    withId
      .withColumn("record", dec(col("value")))
      .withColumn("partyId", col("key").cast("string"))
  }

  private def fromRecord(rec: GenericRecord, schema: StructType): Row =
    Row.fromSeq(schema.fields.map { f =>
      rec.get(f.name) match {
        case null => null
        case s: org.apache.avro.util.Utf8 => s.toString
        case s: CharSequence => s.toString
        case b: java.nio.ByteBuffer =>
          val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
        case nested: GenericRecord =>
          fromRecord(nested, f.dataType.asInstanceOf[StructType])
        case other => other
      }
    }.toIndexedSeq)
}
