package graft.schema

import org.apache.avro.Schema
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro `.avsc` ⇄ Spark `StructType` conversion with the reference's type
  * rules (SURVEY.md §1.2; reference `recordmapping/AvroGenericRecordMapper
  * .java:77-115,324-362`, `DslRecordMapping.java:975-985,1186-1196`):
  *
  *  - unions must be trivial `[null, T]` → a nullable Spark field; any other
  *    union is rejected at schema-load time (the reference's compile-time
  *    `SchemaMappingException` becomes an `IllegalArgumentException` here);
  *  - `enum` → string, `fixed` → binary (spark-avro's public convention);
  *  - timestamps stay epoch-millis longs (no logical types);
  *  - field defaults are preserved so the mapping DSL can leave unmapped /
  *    absent fields at their schema default.
  */
object AvroSchemas {

  final case class Field(name: String, dataType: DataType, nullable: Boolean,
                         default: Option[Any])

  def parse(avsc: String): Schema = new Schema.Parser().parse(avsc)

  def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"top-level schema must be a record, got ${schema.getType}")
    StructType(fields(schema).map(f => StructField(f.name, f.dataType, f.nullable)))
  }

  def fields(record: Schema): Seq[Field] = fields(record, Set.empty)

  private def fields(record: Schema, seen: Set[String]): Seq[Field] = {
    // SELF-referential records are legal Avro but have no finite StructType:
    // reject them cleanly (the contract's IllegalArgumentException) instead
    // of recursing RECORD -> UNION -> RECORD into a StackOverflowError
    require(!seen.contains(record.getFullName),
      s"recursive record schemas are not representable as StructType: ${record.getFullName}")
    val seen2 = seen + record.getFullName
    record.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = convert(f.schema(), seen2)
      Field(f.name(), dt, nullable, defaultValue(f))
    }
  }

  /** (sparkType, nullable). */
  def convert(s: Schema): (DataType, Boolean) = convert(s, Set.empty)

  private def convert(s: Schema, seen: Set[String]): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case Schema.Type.ENUM    => (StringType, false)
    case Schema.Type.FIXED   => (BinaryType, false)
    case Schema.Type.ARRAY   =>
      val (elem, elemNullable) = convert(s.getElementType, seen)
      (ArrayType(elem, containsNull = elemNullable), false)
    case Schema.Type.MAP     =>
      val (v, vNullable) = convert(s.getValueType, seen)
      (MapType(StringType, v, valueContainsNull = vNullable), false)
    case Schema.Type.RECORD  =>
      (StructType(fields(s, seen).map(f =>
        StructField(f.name, f.dataType, f.nullable))), false)
    case Schema.Type.UNION   =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 2 && nonNull.size == 1,
        s"only trivial [null, T] unions are supported, got: $s")
      val (dt, _) = convert(nonNull.head, seen)
      (dt, true)
    case Schema.Type.NULL    => (NullType, true)
  }

  private def defaultValue(f: Schema.Field): Option[Any] = {
    if (!f.hasDefaultValue) return None
    val json = f.defaultVal()
    json match {
      case null | org.apache.avro.JsonProperties.NULL_VALUE => Some(null)
      case v: java.lang.Number => Some(v)
      case v: java.lang.Boolean => Some(v)
      case v: CharSequence => Some(v.toString)
      case _ => None // complex defaults: treated as unset (null)
    }
  }
}
