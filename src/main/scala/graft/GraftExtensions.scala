package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.StringType

/** SQL surface for the graft expression library: registers every custom
  * Catalyst expression as a SQL function via `SparkSessionExtensions`, so
  * `spark.sql("SELECT mincode_to_json(u) ...")` works the same as the
  * Column API in [[graft.functions.GraftFunctions]].
  *
  * Activate with `spark.sql.extensions=graft.GraftExtensions` (done by
  * [[GraftSession]]) — the standard deployment path for a Spark library's
  * engine extensions (SURVEY.md §2's "registered via SparkSessionExtensions"
  * note for custom operators).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // Optimizer rules (the Rule[LogicalPlan] leg of SURVEY §2's custom-
    // operator mechanism): domain rewrites the built-in optimizer cannot
    // know — runs inside the fixed-point operator-optimization batch, so
    // every rule here must be idempotent.
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinRewrite)
  }
}

object GraftExtensions {

  /** A plan-time string literal argument (e.g. a JSONPath or digest
    * algorithm) — mirrors the reference's mapping-compile-time validation:
    * a non-literal fails analysis, not execution. */
  private def litStr(e: Expression, what: String): String = {
    require(e.foldable && e.dataType == StringType,
      s"$what must be a string literal")
    val v = e.eval(null)
    require(v != null, s"$what must not be NULL")
    v.toString
  }

  /** A plan-time integer literal argument (same compile-time contract). */
  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be an integer literal")
    val v = e.eval(null)
    require(v != null, s"$what must not be NULL")
    v.toString.toInt
  }

  private def fn(name: String, usage: String)(b: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      // the 11-arg constructor is the only non-deprecated one carrying a
      // usage string; "scala_udf" is the closest allowed source tag for an
      // extension-registered native expression
      new ExpressionInfo("graft.functions", null, name, usage,
        "", "", "", "", "", "", "scala_udf"),
      b)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("mincode_to_json", "mincode_to_json(str) - decode a mincode payload to a JSON string (null if malformed)") {
      args => MincodeToJson(args.head) },
    fn("murmur3_utf8", "murmur3_utf8(str) - Guava-compatible murmur3_32 of the string's UTF-8 bytes") {
      args => Murmur3Utf8(args.head) },
    fn("base36_to_long", "base36_to_long(str) - base-36 parse, null on malformed/overflow") {
      args => Base36ToLong(args.head) },
    fn("base36_to_int", "base36_to_int(str) - base-36 parse, null on malformed/overflow") {
      args => Base36ToInt(args.head) },
    fn("simhash64", "simhash64(text) - 64-bit tf-weighted SimHash (md5-low-64 token hash)") {
      args => SimHash64(args.head) },
    fn("divolte_id_timestamp", "divolte_id_timestamp(id) - embedded epoch-millis of a divolte identifier") {
      args => DivolteIdTimestamp(args.head) },
    fn("uri_parse", "uri_parse(str) - parse-once URI component struct") {
      args => UriParse(args.head) },
    fn("browser_decode", "browser_decode(query_string) - one-pass browser wire decode struct") {
      args => BrowserDecode(args.head) },
    fn("ua_parse", "ua_parse(user_agent[, 'db_path']) - user-agent classification struct; optional uap-core regexes.yaml database path (plan-time literal)") {
      args => UaParse(args.head,
        args.drop(1).headOption.map(litStr(_, "ua_parse database path"))) },
    fn("parse_query_string", "parse_query_string(str) - multi-value query-string map") {
      args => ParseQueryString(args.head) },
    fn("split_header_value", "split_header_value(str) - RFC-7230 header value split") {
      args => SplitHeaderValue(args.head) },
    fn("json_path_query", "json_path_query(json, 'path') - full JSONPath over a JSON string; path is a plan-time literal") {
      args => JsonPathQuery(args(0), litStr(args(1), "json_path_query path")) },
    fn("scale_floats", "scale_floats(array<float>) - floor(x*1e7) scaled-long embedding representation") {
      args => ScaleFloats(args.head) },
    fn("dot_long_arrays", "dot_long_arrays(a, b) - exact dot product of two long arrays") {
      args => DotLongArrays(args(0), args(1)) },
    fn("ewma_fold", "ewma_fold(array<long>) - truncated dyadic EWMA, oldest first, newest weighs 1/2") {
      args => EwmaFold(args.head) },
    fn("levenshtein_bounded", "levenshtein_bounded(a, b, k) - edit distance if <= k else -1, early-abandoning; k is a plan-time integer literal") {
      args => LevenshteinBounded(args(0), args(1), {
        val e = args(2)
        require(e.foldable, "levenshtein_bounded threshold must be a literal")
        val v = e.eval(null)
        require(v != null, "levenshtein_bounded threshold must not be NULL")
        v.toString.toInt
      }) },
    fn("synth_bmp", "synth_bmp(k) - deterministic real 24bpp BMP container bytes for seed k") {
      args => SynthBmp(args.head) },
    fn("synth_wav", "synth_wav(k) - deterministic real RIFF/WAVE PCM container bytes for seed k") {
      args => SynthWav(args.head) },
    fn("bmp_decode_stats", "bmp_decode_stats(blob, outW, outH) - real BMP parse -> struct(width,height,n_bytes,pixel_sum,resized_sum); null on corrupt bytes") {
      args => BmpDecodeStats(args(0), litInt(args(1), "bmp_decode_stats outW"),
        litInt(args(2), "bmp_decode_stats outH")) },
    fn("wav_decode_stats", "wav_decode_stats(blob) - real RIFF/WAVE parse -> struct(sample_rate,channels,bits,n_frames,duration_ms,energy); null on corrupt bytes") {
      args => WavDecodeStats(args.head) },
    fn("synth_bmp_seeded", "synth_bmp_seeded(k) - seeded demo BMP; k and k^1 share identical images") {
      args => SynthBmpSeeded(args.head) },
    fn("bmp_dhash", "bmp_dhash(blob) - real BMP decode -> perceptual difference-hash as 4x16-bit int chunks; null on corrupt bytes") {
      args => BmpDHash(args.head) },
    fn("synth_wav_seeded", "synth_wav_seeded(k) - seeded demo WAV; k and k^1 share PCM content but differ at byte level") {
      args => SynthWavSeeded(args.head) },
    fn("wav_fingerprint", "wav_fingerprint(blob) - real RIFF/WAVE decode -> struct(sig,energy,n_frames) audio content fingerprint; null on corrupt bytes") {
      args => WavFingerprint(args.head) },
    fn("synth_avi", "synth_avi(k) - deterministic real uncompressed-DIB AVI container bytes for seed k") {
      args => SynthAvi(args.head) },
    fn("avi_decode_stats", "avi_decode_stats(blob) - real AVI parse -> struct(width,height,n_frames,us_per_frame,duration_ms,pixel_sum); null on corrupt bytes") {
      args => AviDecodeStats(args.head) },
    fn("avi_frame_sums", "avi_frame_sums(blob, step) - real AVI decode -> pixel mass of every step-th frame as array<long>; null on corrupt bytes") {
      args => AviFrameSums(args(0), litInt(args(1), "avi_frame_sums step")) },
    fn("hilbert_index", "hilbert_index(x, y) - order-16 Hilbert space-filling-curve position (inputs masked to 16 bits)") {
      args => HilbertIndex(args(0), args(1)) },
    fn("xff_peer_address", "xff_peer_address(header) - rightmost X-Forwarded-For IP literal (normalized), null if absent/non-literal") {
      args => XffPeerAddress(args.head) },
    fn("unicode_normalize", "unicode_normalize(str, 'NFC'|'NFD'|'NFKC'|'NFKD') - Unicode normalization; form is a plan-time literal") {
      args => UnicodeNormalize(args(0), litStr(args(1), "unicode_normalize form")) },
    fn("gear_chunks", "gear_chunks(text) - FastCDC gear-hash chunking: array of (start, len, hash) structs tiling the input") {
      args => GearChunksExpr(args.head) },
    fn("gear_chunks_raw", "gear_chunks_raw(text) - suppression/restart-free gear chunking over codepoints: array of (start, len) spans (the oracle-able boundary math)") {
      args => GearChunksRawExpr(args.head) },
    fn("damerau_levenshtein", "damerau_levenshtein(a, b) - unrestricted Damerau-Levenshtein edit distance (Lowrance-Wagner, byte-level)") {
      args => DamerauLevDistance(args(0), args(1)) },
    fn("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity, DuckDB-compatible semantics") {
      args => JaroWinklerSim(args(0), args(1)) },
    fn("tdigest_quantile", "tdigest_quantile(digest, q) - quantile estimate from a t-digest centroid array; q is a plan-time literal in [0, 1]") {
      args => TDigestQuantileExpr(args(0), {
        val e = args(1)
        require(e.foldable, "tdigest_quantile q must be a literal")
        val v = e.eval(null)
        require(v != null, "tdigest_quantile q must not be NULL")
        v.toString.toDouble
      }) },
    fn("digest_pieces", "digest_pieces('algorithm', pieces...) - ordered multi-piece digest; null pieces skipped") {
      args => DigestPieces(litStr(args.head, "digest algorithm"), None, args.tail) },
    fn("digest_pieces_seeded", "digest_pieces_seeded('algorithm', 'seed', pieces...) - HMAC digest with PBKDF2-derived key") {
      args => DigestPieces(litStr(args.head, "digest algorithm"),
        Some(litStr(args(1), "digest seed")), args.drop(2)) })
}
