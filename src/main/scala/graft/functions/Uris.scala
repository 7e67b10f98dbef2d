package graft.functions

import java.net.URI
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parse-once URI producer — the Spark form of the reference's memoized
  * `parseUri` family (`UriValueProducer`, `DslRecordMapping.java:449-530`,
  * built on java.net.URI exactly as here): ONE parse per row yields every
  * component the reference exposes, instead of one `parse_url` re-parse per
  * projected component (8 components cost 8 parses otherwise).
  *
  * Component semantics (all absent→null, like the reference's
  * Optional.empty on parse/component absence):
  * scheme/host; port (absent when undefined, java.net.URI -1); decoded
  * `path` + `rawPath`; decoded `query` + `rawQuery`; decoded `fragment` +
  * `rawFragment`. Malformed input → all-null fields (the reference wraps
  * the parse in a try and produces absent).
  */
object Uris {

  val schema: StructType = StructType(Seq(
    StructField("scheme", StringType),
    StructField("host", StringType),
    StructField("port", IntegerType),
    StructField("path", StringType),
    StructField("rawPath", StringType),
    StructField("query", StringType),
    StructField("rawQuery", StringType),
    StructField("fragment", StringType),
    StructField("rawFragment", StringType)))

  private val empty = new GenericInternalRow(new Array[Any](9))

  def parseInternal(url: UTF8String): InternalRow = {
    if (url == null) return empty
    try {
      val u = new URI(url.toString)
      def s(v: String): AnyRef = if (v == null) null else UTF8String.fromString(v)
      new GenericInternalRow(Array[Any](
        s(u.getScheme), s(u.getHost),
        if (u.getPort == -1) null else Integer.valueOf(u.getPort),
        s(u.getPath), s(u.getRawPath),
        s(u.getQuery), s(u.getRawQuery),
        s(u.getFragment), s(u.getRawFragment)))
    } catch {
      case _: Exception => empty
    }
  }
}
