package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Catalyst expressions wrapping [[MediaCodec]] — the multimodal
  * byte-in/struct-out contract: a BINARY column goes in, one parse
  * recovers every metadata/feature field as a struct (the parse-once
  * pattern shared with `UriParse`/the UA struct). Decode failures yield a
  * null struct — absent semantics, a corrupt blob never kills the stage.
  *
  * All four are `CodegenFallback`: their cost is the per-row pixel/sample
  * loop inside the static decoder, not interpreter dispatch (same
  * rationale as the digest expressions in `expressions.scala`).
  */
case class SynthBmp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(k: Any): Any = MediaCodec.synthBmp(k.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): SynthBmp = copy(c)
  override def prettyName: String = "synth_bmp"
}

case class SynthWav(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(k: Any): Any = MediaCodec.synthWav(k.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): SynthWav = copy(c)
  override def prettyName: String = "synth_wav"
}

case class SynthBmpSeeded(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(k: Any): Any =
    MediaCodec.synthBmpSeeded(k.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): SynthBmpSeeded =
    copy(c)
  override def prettyName: String = "synth_bmp_seeded"
}

/** Real decode + perceptual difference-hash: BMP bytes in, the 4×16-bit
  * dHash chunk array out (null on corrupt bytes). See
  * [[MediaCodec.dhashChunks]] for the bit layout. */
case class BmpDHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(blob: Any): Any = {
    val img = MediaCodec.decodeBmp(blob.asInstanceOf[Array[Byte]])
    if (img == null) null
    else new GenericArrayData(MediaCodec.dhashChunks(img))
  }
  override protected def withNewChildInternal(c: Expression): BmpDHash = copy(c)
  override def prettyName: String = "bmp_dhash"
}

case class SynthWavSeeded(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(k: Any): Any =
    MediaCodec.synthWavSeeded(k.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): SynthWavSeeded =
    copy(c)
  override def prettyName: String = "synth_wav_seeded"
}

/** Real decode + audio content fingerprint: RIFF/WAVE bytes in,
  * struct(sig 15-bit loudness-envelope signature, energy Σs², n_frames)
  * out — computed from DECODED samples, so container-level byte noise
  * (metadata chunks, padding) cannot split content-identical clips. */
case class WavFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override val dataType: DataType = StructType(Seq(
    StructField("sig", IntegerType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))
  override def nullSafeEval(blob: Any): Any = {
    val clip = MediaCodec.decodeWav(blob.asInstanceOf[Array[Byte]])
    if (clip == null) return null
    val (sig, energy) = MediaCodec.audioFingerprint(clip)
    InternalRow(sig, energy, clip.samples.length / clip.channels)
  }
  override protected def withNewChildInternal(c: Expression): WavFingerprint =
    copy(child = c)
  override def prettyName: String = "wav_fingerprint"
}

case class SynthAvi(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(k: Any): Any = MediaCodec.synthAvi(k.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): SynthAvi = copy(c)
  override def prettyName: String = "synth_avi"
}

/** One real AVI parse per row → video metadata + whole-clip pixel mass:
  * avih geometry/timing recovered from actual header bytes, frame count
  * from the actual movi payloads, duration integer-exact. */
case class AviDecodeStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override val dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("us_per_frame", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("pixel_sum", LongType, nullable = false)))
  override def nullSafeEval(blob: Any): Any = {
    val v = MediaCodec.decodeAvi(blob.asInstanceOf[Array[Byte]])
    if (v == null) return null
    var sum = 0L
    v.frames.foreach { frame =>
      var i = 0
      while (i < frame.length) {
        val p = frame(i)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        i += 1
      }
    }
    InternalRow(v.width, v.height, v.frames.length, v.usPerFrame,
      v.frames.length.toLong * v.usPerFrame / 1000L, sum)
  }
  override protected def withNewChildInternal(c: Expression): AviDecodeStats =
    copy(child = c)
  override def prettyName: String = "avi_decode_stats"
}

/** Real frame sampling: decode the AVI, keep every `step`-th frame, return
  * each kept frame's pixel mass (array position p ↦ frame index p*step).
  * The explode into per-frame rows happens in the query — work stays
  * partition-local, rows scale with SAMPLED frames. */
case class AviFrameSums(child: Expression, step: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(step > 0, "frame step must be positive")
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(blob: Any): Any = {
    val v = MediaCodec.decodeAvi(blob.asInstanceOf[Array[Byte]])
    if (v == null) return null
    val sums = Array.newBuilder[Long]
    var f = 0
    while (f < v.frames.length) {
      val frame = v.frames(f)
      var sum = 0L
      var i = 0
      while (i < frame.length) {
        val p = frame(i)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        i += 1
      }
      sums += sum
      f += step
    }
    new GenericArrayData(sums.result())
  }
  override protected def withNewChildInternal(c: Expression): AviFrameSums =
    copy(child = c)
  override def prettyName: String = "avi_frame_sums"
}

/** One real BMP parse per row → all image metadata + features:
  * header geometry, byte size, full-resolution pixel mass, and the
  * nearest-neighbour `outW`×`outH` thumbnail's pixel mass (the resize
  * happens here, on the decoded pixels — not header arithmetic). */
case class BmpDecodeStats(child: Expression, outW: Int, outH: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(outW > 0 && outH > 0, "resize dims must be positive")
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override val dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("pixel_sum", LongType, nullable = false),
    StructField("resized_sum", LongType, nullable = false)))

  override def nullSafeEval(blob: Any): Any = {
    val bytes = blob.asInstanceOf[Array[Byte]]
    val img = MediaCodec.decodeBmp(bytes)
    if (img == null) return null
    var pixelSum = 0L
    var i = 0
    while (i < img.pixels.length) {
      val p = img.pixels(i)
      pixelSum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      i += 1
    }
    val resized = MediaCodec.resizeNearest(img, outW, outH)
    var resizedSum = 0L
    i = 0
    while (i < resized.length) {
      val p = resized(i)
      resizedSum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      i += 1
    }
    InternalRow(img.width, img.height, bytes.length, pixelSum, resizedSum)
  }
  override protected def withNewChildInternal(c: Expression): BmpDecodeStats =
    copy(child = c)
  override def prettyName: String = "bmp_decode_stats"
}

/** One real RIFF/WAVE parse per row → audio metadata + energy features:
  * fmt-chunk fields, frame count, integer-exact duration, and the PCM
  * energy Σ s² (the loudness feature a filter pipeline thresholds on). */
case class WavDecodeStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override val dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("energy", LongType, nullable = false)))

  override def nullSafeEval(blob: Any): Any = {
    val clip = MediaCodec.decodeWav(blob.asInstanceOf[Array[Byte]])
    if (clip == null) return null
    var energy = 0L
    var i = 0
    while (i < clip.samples.length) {
      val s = clip.samples(i).toLong
      energy += s * s
      i += 1
    }
    val nFrames = clip.samples.length / clip.channels
    val durationMs = nFrames.toLong * 1000L / clip.sampleRate
    InternalRow(clip.sampleRate, clip.channels, clip.bitsPerSample,
      nFrames, durationMs, energy)
  }
  override protected def withNewChildInternal(c: Expression): WavDecodeStats =
    copy(child = c)
  override def prettyName: String = "wav_decode_stats"
}
