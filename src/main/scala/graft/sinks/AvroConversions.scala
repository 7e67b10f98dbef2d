package graft.sinks

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord, GenericRecordBuilder}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** StructType → Avro schema + Row → GenericRecord conversion for the sink
  * layer (the engine-side counterpart of §1.2's Avro→Spark rules). Nullable
  * fields become trivial `[null, T]` unions — the exact inverse of
  * `AvroSchemas.convert`.
  */
object AvroConversions {

  /** Executor-side parsed-schema cache shared by the topic sink and source
    * codecs (Schema.Parser is too slow for per-row use). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Schema]()
  private[graft] def cachedSchema(json: String): Schema =
    schemaCache.computeIfAbsent(json, j => new Schema.Parser().parse(j))

  def toAvroSchema(struct: StructType, recordName: String = "graft_record",
                   namespace: String = "graft"): Schema = {
    val fields = struct.fields.map { f =>
      val base = fieldSchema(f.dataType, s"${recordName}_${f.name}")
      val sch = if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      new Schema.Field(f.name, sch,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, namespace, false, fields.toList.asJava)
  }

  private def fieldSchema(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType | TimestampNTZType => Schema.create(Schema.Type.LONG) // epoch-millis
    case ArrayType(elem, containsNull) =>
      val e = fieldSchema(elem, name + "_item")
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), e) else e)
    case MapType(StringType, v, valueContainsNull) =>
      val vs = fieldSchema(v, name + "_value")
      Schema.createMap(
        if (valueContainsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), vs) else vs)
    case s: StructType => toAvroSchema(s, name)
    case other => throw new IllegalArgumentException(s"unsupported sink type: $other")
  }

  def toRecord(row: Row, schema: Schema): GenericRecord = {
    val b = new GenericRecordBuilder(schema)
    row.schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fieldSch = unwrap(schema.getField(f.name).schema())
      b.set(f.name, convertValue(row.get(i), f.dataType, fieldSch))
    }
    b.build()
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def convertValue(v: Any, dt: DataType, sch: Schema): Any = v match {
    case null => null
    case r: Row => toRecord(r, sch)
    case seq: scala.collection.Seq[_] =>
      val elemType = dt.asInstanceOf[ArrayType].elementType
      val elemSch = unwrap(sch.getElementType)
      new GenericData.Array(sch,
        seq.map(convertValue(_, elemType, elemSch).asInstanceOf[AnyRef]).asJava)
    case m: scala.collection.Map[_, _] =>
      val valueType = dt.asInstanceOf[MapType].valueType
      val valueSch = unwrap(sch.getValueType)
      m.map { case (k, mv) =>
        k.toString -> convertValue(mv, valueType, valueSch).asInstanceOf[AnyRef]
      }.asJava
    case s: java.lang.Short => s.intValue // Avro INT per fieldSchema
    case b: java.lang.Byte => b.intValue
    case ts: java.sql.Timestamp => ts.getTime
    case ts: java.time.Instant => ts.toEpochMilli
    case ts: java.time.LocalDateTime =>
      ts.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    case bytes: Array[Byte] => java.nio.ByteBuffer.wrap(bytes)
    case other => other
  }
}
