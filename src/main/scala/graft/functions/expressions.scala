package graft.functions

import graft.model.DivolteId
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the reference's non-built-in functions
  * (SURVEY.md §4 "custom Catalyst work actually required").
  *
  * The per-row hot-path functions (murmur3 checksum, base36, mincode,
  * identifier parsing) implement `doGenCode` as a static call into the pure
  * Scala implementations, so they stay inside whole-stage codegen — the
  * generated code is a single JVM static invoke, no UDF serialization
  * boundary. The construction-time-heavy ops (digests, query-string/header
  * parsing producing nested types) use `CodegenFallback`: their cost is
  * dominated by crypto/allocation, not dispatch.
  */
private[graft] trait StaticCallUnary extends UnaryExpression {
  /** Fully-qualified static method reference, e.g.
    * `"graft.functions.Mincode.toJson"`. The method must accept a String
    * (null-free: nullSafeCodeGen guards) and return a boxed result or null. */
  def staticCall: String
  def resultJavaType: String
  def boxToCatalyst(resultVar: String): String
  def evalImpl(input: String): Any

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = evalImpl(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("res")
      s"""
         |$resultJavaType $tmp = $staticCall($c.toString());
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${boxToCatalyst(tmp)};
         |}
       """.stripMargin
    })
}

/** Mincode → JSON string (reference `mincode/MincodeParser.java`; spec
  * `resources/divolte.js:893-917`). Malformed input → null. */
case class MincodeToJson(child: Expression) extends StaticCallUnary {
  override def dataType: DataType = StringType
  override def staticCall: String = "graft.functions.Mincode.toJson"
  override def resultJavaType: String = "String"
  override def boxToCatalyst(v: String): String =
    s"org.apache.spark.unsafe.types.UTF8String.fromString($v)"
  override def evalImpl(s: String): Any = {
    val r = Mincode.toJson(s)
    if (r == null) null else UTF8String.fromString(r)
  }
  override protected def withNewChildInternal(c: Expression): MincodeToJson = copy(c)
  override def prettyName: String = "mincode_to_json"
}

/** Rightmost X-Forwarded-For entry → normalized IP literal, null when the
  * header is absent/blank or the entry is not an IP literal (reference
  * `ProxyAdjacentPeerAddressHandler.java:40-59`; keep-old-on-failure is
  * `coalesce(xff_peer_address(h), remoteHost)` so it stays codegen'd). */
case class XffPeerAddress(child: Expression) extends StaticCallUnary {
  override def dataType: DataType = StringType
  override def staticCall: String = "graft.functions.PeerAddresses.resolveXff"
  override def resultJavaType: String = "String"
  override def boxToCatalyst(v: String): String =
    s"org.apache.spark.unsafe.types.UTF8String.fromString($v)"
  override def evalImpl(s: String): Any = {
    val r = PeerAddresses.resolveXff(s)
    if (r == null) null else UTF8String.fromString(r)
  }
  override protected def withNewChildInternal(c: Expression): XffPeerAddress = copy(c)
  override def prettyName: String = "xff_peer_address"
}

/** Guava-compatible murmur3_32 of a string's UTF-8 bytes (reference checksum,
  * `ClientSideCookieEventHandler.java:206-216`). */
case class Murmur3Utf8(child: Expression) extends StaticCallUnary {
  override def dataType: DataType = IntegerType
  override def staticCall: String = "graft.functions.Murmur3.hashStringUtf8"
  override def resultJavaType: String = "java.lang.Integer"
  override def boxToCatalyst(v: String): String = s"$v.intValue()"
  override def evalImpl(s: String): Any = Murmur3.hashStringUtf8(s)
  override protected def withNewChildInternal(c: Expression): Murmur3Utf8 = copy(c)
  override def prettyName: String = "murmur3_utf8"
}

/** Base-36 long parse with the reference's tryParse semantics — null (not an
  * error, not wraparound) on any malformed or overflowing input
  * (`ClientSideCookieEventHandler.java:263-277`). */
case class Base36ToLong(child: Expression) extends StaticCallUnary {
  override def dataType: DataType = LongType
  override def staticCall: String = "graft.model.DivolteId.tryParseBase36Long"
  override def resultJavaType: String = "java.lang.Long"
  override def boxToCatalyst(v: String): String = s"$v.longValue()"
  override def evalImpl(s: String): Any = DivolteId.tryParseBase36Long(s)
  override protected def withNewChildInternal(c: Expression): Base36ToLong = copy(c)
  override def prettyName: String = "base36_to_long"
}

case class Base36ToInt(child: Expression) extends StaticCallUnary {
  override def dataType: DataType = IntegerType
  override def staticCall: String = "graft.model.DivolteId.tryParseBase36Int"
  override def resultJavaType: String = "java.lang.Integer"
  override def boxToCatalyst(v: String): String = s"$v.intValue()"
  override def evalImpl(s: String): Any = DivolteId.tryParseBase36Int(s)
  override protected def withNewChildInternal(c: Expression): Base36ToInt = copy(c)
  override def prettyName: String = "base36_to_int"
}

/** 64-bit SimHash of a document's text (md5-low-64 token hash, tf-weighted
  * bit votes) — see [[SimHash]] for the bit-parity contract. */
case class SimHash64(child: Expression) extends StaticCallUnary {
  override def dataType: DataType = LongType
  override def staticCall: String = "graft.functions.SimHash.simhash64"
  override def resultJavaType: String = "java.lang.Long"
  override def boxToCatalyst(v: String): String = s"$v.longValue()"
  override def evalImpl(s: String): Any = SimHash.simhash64(s)
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  override def prettyName: String = "simhash64"
}

/** Embedded creation timestamp of a DivolteIdentifier
  * (`DivolteIdentifier.java:55-61,94-102`); null if malformed. */
case class DivolteIdTimestamp(child: Expression) extends StaticCallUnary {
  override def dataType: DataType = LongType
  override def staticCall: String = "graft.model.DivolteId.timestampOf"
  override def resultJavaType: String = "java.lang.Long"
  override def boxToCatalyst(v: String): String = s"$v.longValue()"
  override def evalImpl(s: String): Any = DivolteId.timestampOf(s)
  override protected def withNewChildInternal(c: Expression): DivolteIdTimestamp = copy(c)
  override def prettyName: String = "divolte_id_timestamp"
}

/** One-pass browser wire decode (query-string parse + checksum + base36 +
  * mincode) into a struct — see [[BrowserWire]]. Builds the InternalRow
  * directly; doGenCode is a single static call so the surrounding
  * projection stays in whole-stage codegen. */
case class BrowserDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BrowserWire.schema
  override def nullable: Boolean = false
  // NOT nullSafeEval/nullSafeCodeGen: those short-circuit a null child to a
  // null RESULT, which a nullable=false struct must never produce (codegen
  // would even call decodeInternal with the slot's stale default). The
  // decoder itself treats null as an unparseable (corrupt-flagged) frame.
  override def eval(input: InternalRow): Any =
    BrowserWire.decodeInternal(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val c = child.genCode(ctx)
    val row = ctx.freshName("bwRow")
    ev.copy(
      code = code"""
        |${c.code}
        |InternalRow $row = graft.functions.BrowserWire.decodeInternal(
        |  ${c.isNull} ? null : ${c.value});
        """.stripMargin,
      isNull = FalseLiteral,
      value = JavaCode.variable(row, dataType))
  }
  override protected def withNewChildInternal(c: Expression): BrowserDecode = copy(c)
  override def prettyName: String = "browser_decode"
}

/** Full-string regex capture with EXACT java.util.regex semantics
  * (reference `DslRecordMapping` match(...).group(...)): null when the
  * whole pattern does not match OR the group did not participate, the
  * group's text — possibly "" — when it did. `regexp_extract` can express
  * neither distinction (it renders both misses and empty matches as ""),
  * and this also replaces the rlike + regexp_extract DOUBLE regex run
  * with one matcher call. */
case class RegexMatchGroup(child: Expression, pattern: String, group: Int)
    extends UnaryExpression with ExpectsInputTypes {
  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)
  // Fail at construction (= mapping-compile time) like the reference, where a
  // typo'd index throws from Matcher.group(n) on the first event; silent
  // all-null output would hide the config error. Null stays reserved for
  // non-participating groups only.
  require(
    group >= 0 && group <= compiled.matcher("").groupCount(),
    s"regex group $group out of range: pattern '$pattern' has " +
      s"${compiled.matcher("").groupCount()} capture group(s)")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  def evalOne(u: UTF8String): UTF8String = {
    if (u == null) return null
    val m = compiled.matcher(u.toString)
    if (!m.matches()) null
    else {
      val g = m.group(group)
      if (g == null) null else UTF8String.fromString(g)
    }
  }
  override def nullSafeEval(input: Any): Any =
    evalOne(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rmg", this, classOf[RegexMatchGroup].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.evalOne($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): RegexMatchGroup =
    copy(child = c)
  override def prettyName: String = "regex_match_group"
}

/** User-agent classification struct (see [[UserAgents]]) — direct
  * InternalRow construction with a per-thread LRU behind it. Tolerates null
  * input (null UA → all-null struct, reference absent semantics).
  * `dbPath` (plan-time constant) points at a loaded [[UaDatabase]]
  * (uap-core `regexes.yaml`) consulted ahead of the built-in heuristics;
  * the path ships with the serialized plan, so every executor loads the
  * same database from shared storage. */
case class UaParse(child: Expression, dbPath: Option[String] = None)
    extends UnaryExpression {
  override def dataType: DataType = UserAgents.schema
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    UserAgents.parseInternal(
      child.eval(input).asInstanceOf[UTF8String], dbPath.orNull)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val c = child.genCode(ctx)
    val row = ctx.freshName("uaRow")
    val pathRef = dbPath match {
      case Some(p) => ctx.addReferenceObj("uaDbPath", p, "java.lang.String")
      case None => "(java.lang.String) null"
    }
    ev.copy(
      code = code"""
        |${c.code}
        |InternalRow $row = graft.functions.UserAgents.parseInternal(
        |  ${c.isNull} ? null : ${c.value}, $pathRef);
        """.stripMargin,
      isNull = FalseLiteral,
      value = JavaCode.variable(row, dataType))
  }
  override protected def withNewChildInternal(c: Expression): UaParse =
    copy(child = c)
  override def prettyName: String = "ua_parse"
}

/** Full goessner/jayway JSONPath over a JSON string column — the complete
  * dialect the reference's `eventParameters().path(expr)` accepts
  * (`DslRecordMapping.java:587-594`), beyond `get_json_object`'s subset
  * (recursive descent, slices, unions, filters). The path compiles ONCE at
  * expression construction (plan time) — malformed paths fail analysis like
  * the reference's mapping-compile-time `JsonPath.compile` — and codegen
  * passes the compiled object through a reference obj, so evaluation is a
  * single static call inside whole-stage codegen. */
case class JsonPathQuery(child: Expression, path: String) extends UnaryExpression {
  private val compiled: JsonPaths.Compiled = JsonPaths.compile(path)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    JsonPaths.evalToJsonUtf8(input.asInstanceOf[UTF8String], compiled)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonPathCompiled", compiled, "java.lang.Object")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("jp")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $tmp =
         |  graft.functions.JsonPaths.evalToJsonUtf8($c, $ref);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): JsonPathQuery = copy(child = c)
  override def prettyName: String = "json_path_query"
}

/** Parse-once URI component struct (see [[Uris]]) — single java.net.URI
  * parse per row; doGenCode is one static call so the projection stays in
  * whole-stage codegen. Null/malformed input → all-null fields. */
case class UriParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Uris.schema
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    Uris.parseInternal(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val c = child.genCode(ctx)
    val row = ctx.freshName("uriRow")
    ev.copy(
      code = code"""
        |${c.code}
        |InternalRow $row = graft.functions.Uris.parseInternal(
        |  ${c.isNull} ? null : ${c.value});
        """.stripMargin,
      isNull = FalseLiteral,
      value = JavaCode.variable(row, dataType))
  }
  override protected def withNewChildInternal(c: Expression): UriParse = copy(c)
  override def prettyName: String = "uri_parse"
}

/** Query string → map<string, array<string>> with the reference's
  * multi-value, valueless-key and percent-decode semantics
  * (`recordmapping/QueryStringParser.java:37-89`). */
case class ParseQueryString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    MapType(StringType, ArrayType(StringType, containsNull = false), valueContainsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val parsed = QueryStrings.parse(input.toString)
    val keys = new Array[Any](parsed.size)
    val values = new Array[Any](parsed.size)
    var i = 0
    parsed.foreach { case (k, vs) =>
      keys(i) = UTF8String.fromString(k)
      values(i) = new GenericArrayData(vs.map(UTF8String.fromString).toArray[Any])
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }
  override protected def withNewChildInternal(c: Expression): ParseQueryString = copy(c)
  override def prettyName: String = "parse_query_string"
}

/** RFC-7230 header-value splitting (reference
  * `recordmapping/HeaderValueParser.java`): comma-split, quote/escape-aware,
  * whitespace-normalized. */
case class SplitHeaderValue(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(HeaderValues.split(input.toString).map(UTF8String.fromString).toArray[Any])
  override protected def withNewChildInternal(c: Expression): SplitHeaderValue = copy(c)
  override def prettyName: String = "split_header_value"
}

/** Elementwise floor(float*1e7) scaling to the long-integer embedding
  * representation — native counterpart of
  * `transform(arr, x => floor(x.cast(double) * 1e7).cast(long))`, whose
  * lambda Catalyst interprets per element. Input must be array<float>
  * (declared, so array<double> fails analysis instead of being misread);
  * null elements pass through as null elements. */
case class ScaleFloats(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    VecMath.scaleFloats(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecMath.scaleFloats($c)")
  override protected def withNewChildInternal(c: Expression): ScaleFloats = copy(c)
  override def prettyName: String = "scale_floats"
}

/** Exact dot product of two equal-length long arrays — native counterpart of
  * `aggregate(zip_with(a, b, _ * _), 0L, _ + _)`, including its null
  * semantics: mismatched lengths or null elements yield NULL. */
case class DotLongArrays(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VecMath.dotLong(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (r == null) null else r.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Long $tmp = graft.functions.VecMath.dotLong($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLongArrays =
    copy(left = l, right = r)
  override def prettyName: String = "dot_long_arrays"
}

/** Truncated dyadic EWMA over a window-collected long array — native
  * counterpart of the UDF fold ([[graft.functions.Ewma.foldArray]]), kept
  * inside whole-stage codegen so the per-user smoothing pass stays a
  * single generated loop (no UDF serialization per row). */
case class EwmaFold(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val r = Ewma.foldArray(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (r == null) null else r.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("ewma")
      s"""
         |java.lang.Double $tmp = graft.functions.Ewma.foldArray($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): EwmaFold = copy(c)
  override def prettyName: String = "ewma_fold"
}

/** Ordered multi-piece digest (reference `recordmapping/Digester.java`):
  * null pieces contribute no bytes; result is always present (non-null)
  * when the expression itself evaluates. Seeded form is HMAC with the
  * reference's PBKDF2 key derivation. */
case class DigestPieces(
    algorithm: String,
    seed: Option[String],
    children: Seq[Expression]) extends Expression
    with ImplicitCastInputTypes with CodegenFallback {
  // every piece coerces to STRING at analysis time: eval's v.toString on a
  // Catalyst-internal value (Int days-since-epoch for a date, UnsafeRow for
  // a struct) would silently digest the internal rendering instead of the
  // external one
  override def inputTypes: Seq[DataType] =
    Seq.fill(children.size)(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  // Pre-derive the HMAC key at plan time (100k PBKDF2 iterations — reference
  // does this once at mapping-compile time, Digester.java:151-156).
  seed.foreach(s => Digests.deriveKey(algorithm, s))
  override def eval(input: InternalRow): Any = {
    val pieces = new Array[String](children.length)
    var i = 0
    while (i < pieces.length) {
      val v = children(i).eval(input)
      pieces(i) = if (v == null) null else v.toString
      i += 1
    }
    seed match {
      case Some(s) => Digests.hmacDigest(algorithm, s, pieces)
      case None    => Digests.digest(algorithm, pieces)
    }
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): DigestPieces =
    copy(children = cs)
  override def prettyName: String = "digest_pieces"
}

/** Threshold levenshtein with early abandon — contract-identical to the
  * built-in `levenshtein(l, r, k)` (distance if <= k, else -1; see
  * [[ThresholdLevenshtein]] for the parity argument) but abandons a pair
  * as soon as the DP band minimum exceeds k, which is what makes the
  * fuzzy-dedup verify joins candidate-volume-bound instead of
  * text-length-bound. Stays in whole-stage codegen as one static call. */
case class LevenshteinBounded(left: Expression, right: Expression, threshold: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(threshold >= 0, "threshold must be >= 0")
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    ThresholdLevenshtein.distance(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      s"${ev.value} = graft.functions.ThresholdLevenshtein" +
        s".distance($l, $r, $threshold).intValue();"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevenshteinBounded =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "levenshtein_bounded"
}

/** 64-bucket saturated code-point histogram ([[CharHist.hist]]) — the
  * per-document half of the sound fuzzy-dedup pre-verify prune
  * (`L1 <= 2 * lev`; see [[CharHist]] for the bound). Computed once per
  * document, 64 bytes of shuffle payload vs the ~300-byte text it lets
  * candidate pairs avoid fetching. Codegen'd as one static call. */
case class CharHist64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    CharHist.hist(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharHist.hist($c)")
  override protected def withNewChildInternal(newChild: Expression): CharHist64Expr =
    copy(child = newChild)
  override def prettyName: String = "char_hist64"
}

/** L1 distance between two [[CharHist64Expr]] histograms — the per-pair
  * half of the prune. Runs on the candidate join BEFORE the text fetch
  * and the banded DP; 64 byte-compares per pair against the DP's
  * O(len × band) cells. Codegen'd as one static call. */
case class HistL1Expr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(l: Any, r: Any): Any =
    CharHist.l1(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.CharHist.l1($l, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HistL1Expr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hist_l1"
}

/** Quantile estimate from a [[TDigest]] digest column (flat sorted
  * (mean, weight) pairs). Runs on |groups| rows post-aggregation, never on
  * the fact table — CodegenFallback costs nothing here. */
case class TDigestQuantileExpr(child: Expression, q: Double)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()
    val v = TDigest.quantile(arr, q)
    if (v.isNaN) null else v
  }
  override protected def withNewChildInternal(c: Expression): TDigestQuantileExpr =
    copy(child = c)
  override def prettyName: String = "tdigest_quantile"
}

/** Unicode normalization ([[Unicodes]]): NFC/NFD/NFKC/NFKD per the `form`
  * constructor parameter. Codegen'd static invoke — stays in whole-stage
  * codegen like the other per-row text transforms. */
case class UnicodeNormalize(child: Expression, form: String)
    extends StaticCallUnary {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form), s"unknown form: $form")
  override def dataType: DataType = StringType
  override def staticCall: String = s"graft.functions.Unicodes.${form.toLowerCase}"
  override def resultJavaType: String = "String"
  override def boxToCatalyst(v: String): String =
    s"org.apache.spark.unsafe.types.UTF8String.fromString($v)"
  override def evalImpl(s: String): Any =
    UTF8String.fromString(form match {
      case "NFC"  => Unicodes.nfc(s)
      case "NFD"  => Unicodes.nfd(s)
      case "NFKC" => Unicodes.nfkc(s)
      case _      => Unicodes.nfkd(s)
    })
  override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
    copy(child = c)
  override def prettyName: String = s"unicode_${form.toLowerCase}"
}

/** Gear-hash content-defined chunking ([[GearChunker]]): text → array of
  * (start, len, hash) chunk structs. CodegenFallback: the cost is the
  * per-byte gear walk + struct allocation, not dispatch. */
case class GearChunksExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val chunks = GearChunker.chunks(input.asInstanceOf[UTF8String])
    new GenericArrayData(chunks.map { case (st, ln, h) =>
      InternalRow(st, ln, h)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): GearChunksExpr =
    copy(child = newChild)
  override def prettyName: String = "gear_chunks"
}

/** [[GearChunker.blockKeys]] — the two-pass fuzzy-BLOCKING chunk walk:
  * text → array of distinct 64-bit chunk-content keys (pass-2 keys tagged
  * by XOR so the passes' buckets stay disjoint). CodegenFallback for the
  * same reason as [[GearChunksExpr]]. */
case class GearBlockKeysExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(GearChunker.blockKeys(input.asInstanceOf[UTF8String]))

  override protected def withNewChildInternal(newChild: Expression): GearBlockKeysExpr =
    copy(child = newChild)
  override def prettyName: String = "gear_block_keys"
}

/** [[GearChunker.rawChunks]] — the suppression-free, restart-free gear walk
  * whose boundary math a SQL engine can replay exactly (see the Scaladoc
  * there): text → array of (start, len) codepoint spans. */
case class GearChunksRawExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val chunks = GearChunker.rawChunks(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(chunks.map { case (st, ln) =>
      InternalRow(st + 1, ln)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): GearChunksRawExpr =
    copy(child = newChild)
  override def prettyName: String = "gear_chunks_raw"
}

/** All whitespace-token statistics in one pass ([[TextStats]]) — direct
  * InternalRow construction replacing the former Scala UDF, so the
  * quality/token-stat hot path (runs per DOCUMENT under half a dozen
  * queries) stays inside whole-stage codegen without the udf
  * encoder/CatalystTypeConverters round trip per row. The stopword set is
  * a plan-time constant that ships with the serialized plan. */
case class TextStatsExpr(child: Expression, stopwords: Set[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("nTokens", IntegerType, nullable = false),
    StructField("nTypes", IntegerType, nullable = false),
    StructField("stopHits", IntegerType, nullable = false),
    StructField("charSum", LongType, nullable = false)))
  override def nullable: Boolean = true
  def evalOne(u: UTF8String): InternalRow = {
    if (u == null) return null
    val s = TextStats.compute(u.toString, stopwords)
    if (s == null) null else InternalRow(s.nTokens, s.nTypes, s.stopHits, s.charSum)
  }
  override def nullSafeEval(input: Any): Any =
    evalOne(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tse", this, classOf[TextStatsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.evalOne($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): TextStatsExpr =
    copy(child = c)
  override def prettyName: String = "text_stats"
}

/** BPE inference over a token array: flat-encode every whitespace token
  * with the broadcast merge-rank map ([[Bpe.encodeWord]]) and emit the
  * symbol count plus an order-sensitive md5 over the full symbol stream.
  * Replaces the Scala UDF on the per-document encode path (batch
  * `bpeEncodeOn` and the streaming ingest form); the expression reads the
  * ArrayData directly — no Seq[String] conversion per row — and holds the
  * model through the Broadcast handle, so the plan stays small and
  * executors fetch the rank map once. */
case class BpeEncodeExpr(child: Expression,
    rank: org.apache.spark.broadcast.Broadcast[Map[(String, String), Int]])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("nTokens", IntegerType, nullable = false),
    StructField("md5", StringType, nullable = false)))
  override def nullable: Boolean = true
  def evalOne(a: ArrayData): InternalRow = {
    if (a == null) return null
    val r = rank.value
    val sb = new java.lang.StringBuilder
    var count = 0
    var i = 0
    while (i < a.numElements()) {
      val syms = Bpe.encodeWord(a.getUTF8String(i).toString, r)
      var j = 0
      while (j < syms.length) {
        if (count > 0) sb.append(' ')
        sb.append(syms(j))
        count += 1
        j += 1
      }
      i += 1
    }
    InternalRow(count, UTF8String.fromString(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(sb.toString)))
  }
  override def nullSafeEval(input: Any): Any =
    evalOne(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.evalOne($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
    copy(child = c)
  override def prettyName: String = "bpe_encode"
}

/** Greedy WordPiece segmentation of ONE word ([[WordPiece.encodeGreedy]])
  * against broadcast positional piece sets: (piece count, "first ##rest"
  * segmentation). Replaces the word-grain Scala UDF in the oracled batch
  * operator. */
case class WordPieceEncodeExpr(child: Expression,
    model: org.apache.spark.broadcast.Broadcast[(Set[String], Set[String])],
    maxPiece: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("nPieces", IntegerType, nullable = false),
    StructField("seg", StringType, nullable = false)))
  override def nullable: Boolean = true
  def evalOne(u: UTF8String): InternalRow = {
    if (u == null) return null
    val (start, cont) = model.value
    val (n, seg) = WordPiece.encodeGreedy(u.toString, start, cont, maxPiece)
    InternalRow(n, UTF8String.fromString(seg))
  }
  override def nullSafeEval(input: Any): Any =
    evalOne(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpe", this, classOf[WordPieceEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.evalOne($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): WordPieceEncodeExpr =
    copy(child = c)
  override def prettyName: String = "wordpiece_encode"
}

/** Greedy WordPiece over a whole token ARRAY — the streaming
  * tokenize-at-ingest form: total piece count + order-sensitive md5 over
  * the full piece stream (empty tokens skipped, matching the batch
  * applier's filter). Same broadcast model as [[WordPieceEncodeExpr]]. */
case class WordPieceEncodeAllExpr(child: Expression,
    model: org.apache.spark.broadcast.Broadcast[(Set[String], Set[String])],
    maxPiece: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("nPieces", IntegerType, nullable = false),
    StructField("md5", StringType, nullable = false)))
  override def nullable: Boolean = true
  def evalOne(a: ArrayData): InternalRow = {
    if (a == null) return null
    val (s, c) = model.value
    val sb = new java.lang.StringBuilder
    var pieces = 0
    var i = 0
    var first = true
    while (i < a.numElements()) {
      val w = a.getUTF8String(i).toString
      if (w.nonEmpty) {
        val (n, seg) = WordPiece.encodeGreedy(w, s, c, maxPiece)
        if (!first) sb.append(' ')
        sb.append(seg)
        pieces += n
        first = false
      }
      i += 1
    }
    InternalRow(pieces, UTF8String.fromString(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(sb.toString)))
  }
  override def nullSafeEval(input: Any): Any =
    evalOne(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpa", this, classOf[WordPieceEncodeAllExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.evalOne($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): WordPieceEncodeAllExpr =
    copy(child = c)
  override def prettyName: String = "wordpiece_encode_all"
}
