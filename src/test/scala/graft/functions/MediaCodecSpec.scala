package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The media decoders are REAL byte-level parsers; this spec pins the
  * parts the oracle can't see — encode→decode round trips on arbitrary
  * content, wire-format details (bottom-up rows, stride padding, chunk
  * walking), and corrupt-input absent semantics. */
class MediaCodecSpec extends SparkSpec {

  // ------------------------------------------------------------- BMP

  test("bmp round trip recovers every pixel, including stride-padded widths") {
    val rnd = new scala.util.Random(11L)
    // widths chosen to hit all four stride paddings (w*3 % 4 = 0..3)
    for (w <- Seq(4, 5, 6, 7, 16, 33); h <- Seq(1, 3, 8)) {
      val src = Array.fill(w * h)(rnd.nextInt(0x1000000))
      val bytes = MediaCodec.encodeBmp(w, h, (x, y) => src(y * w + x))
      val img = MediaCodec.decodeBmp(bytes)
      assert(img != null && img.width == w && img.height == h)
      assert(img.pixels.sameElements(src), s"pixel mismatch at ${w}x$h")
    }
  }

  test("bmp decode handles top-down files (negative height)") {
    val w = 5; val h = 4
    val src = Array.tabulate(w * h)(i => i * 31 % 0x1000000)
    val bottomUp = MediaCodec.encodeBmp(w, h, (x, y) => src(y * w + x))
    // flip to top-down: negate height, reverse row order in the payload
    val stride = (w * 3 + 3) & ~3
    val td = bottomUp.clone()
    val buf = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -h)
    for (r <- 0 until h; i <- 0 until stride)
      td(54 + r * stride + i) = bottomUp(54 + (h - 1 - r) * stride + i)
    val img = MediaCodec.decodeBmp(td)
    assert(img != null && img.pixels.sameElements(src))
  }

  test("bmp decode rejects corrupt input with null, never an exception") {
    val good = MediaCodec.encodeBmp(8, 8, (_, _) => 0xababab)
    assert(MediaCodec.decodeBmp(null) == null)
    assert(MediaCodec.decodeBmp(Array[Byte]()) == null)
    assert(MediaCodec.decodeBmp(good.take(40)) == null)           // truncated header
    assert(MediaCodec.decodeBmp(good.take(60)) == null)           // truncated pixels
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(MediaCodec.decodeBmp(badMagic) == null)
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(MediaCodec.decodeBmp(bpp8) == null)                    // unsupported bpp
    val rle = good.clone(); rle(30) = 1
    assert(MediaCodec.decodeBmp(rle) == null)                     // compressed
  }

  test("nearest-neighbour resize matches the integer source mapping") {
    val img = MediaCodec.BmpImage(4, 2, Array(
      1, 2, 3, 4,
      5, 6, 7, 8))
    assert(MediaCodec.resizeNearest(img, 2, 2).toSeq == Seq(1, 3, 5, 7))
    assert(MediaCodec.resizeNearest(img, 4, 2).toSeq == img.pixels.toSeq)
    assert(MediaCodec.resizeNearest(img, 1, 1).toSeq == Seq(1))
  }

  // ------------------------------------------------------------- WAV

  test("wav round trip recovers rate, channels and every sample") {
    val rnd = new scala.util.Random(13L)
    for (rate <- Seq(8000, 44100); ch <- Seq(1, 2)) {
      val samples = Array.fill(301 * ch)((rnd.nextInt(65536) - 32768).toShort)
      val clip = MediaCodec.decodeWav(MediaCodec.encodeWav(rate, ch, samples))
      assert(clip != null && clip.sampleRate == rate && clip.channels == ch
        && clip.bitsPerSample == 16)
      assert(clip.samples.sameElements(samples))
    }
  }

  test("wav decode skips unknown chunks (LIST before data) like a real reader") {
    val samples = Array.tabulate(64)(i => (i * 100 - 3200).toShort)
    val canonical = MediaCodec.encodeWav(16000, 1, samples)
    // splice a LIST chunk between fmt and data: [RIFF..fmt ][LIST+7pad][data..]
    val listBody = "INFOetc".getBytes("US-ASCII") // 7 bytes -> odd, word-pad
    val head = canonical.slice(0, 36)             // through end of fmt chunk
    val tail = canonical.slice(36, canonical.length)
    val out = java.nio.ByteBuffer
      .allocate(head.length + 8 + listBody.length + 1 + tail.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(head)
    out.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody)
    out.put(0: Byte)                              // RIFF word alignment
    out.put(tail)
    val bytes = out.array()
    // patch RIFF size
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, bytes.length - 8)
    val clip = MediaCodec.decodeWav(bytes)
    assert(clip != null && clip.sampleRate == 16000)
    assert(clip.samples.sameElements(samples))
  }

  test("wav decode rejects corrupt/unsupported input with null") {
    val good = MediaCodec.encodeWav(8000, 1, Array.tabulate(32)(_.toShort))
    assert(MediaCodec.decodeWav(null) == null)
    assert(MediaCodec.decodeWav(good.take(20)) == null)
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    assert(MediaCodec.decodeWav(notRiff) == null)
    val float32 = good.clone(); float32(20) = 3   // IEEE-float audio format
    assert(MediaCodec.decodeWav(float32) == null)
    val overrun = good.clone()
    java.nio.ByteBuffer.wrap(overrun).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 1 << 30)                        // data size past buffer
    assert(MediaCodec.decodeWav(overrun) == null)
  }

  // ------------------------------------------------------------- dHash

  test("dhash is gradient-sensitive: identical images collide, light edits stay near, heavy edits drift far") {
    def hamming(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val base = MediaCodec.decodeBmp(MediaCodec.synthBmpSeeded(42L))
    val same = MediaCodec.decodeBmp(MediaCodec.synthBmpSeeded(43L)) // partner seed
    assert(hamming(MediaCodec.dhashChunks(base), MediaCodec.dhashChunks(same)) == 0)
    // a light edit: brighten one 9x8 cell's worth of pixels -> few bits move
    val light = base.pixels.clone()
    for (y <- 0 until base.height / 8; x <- 0 until base.width / 9)
      light(y * base.width + x) = 0xffffff
    val dLight = hamming(MediaCodec.dhashChunks(base),
      MediaCodec.dhashChunks(MediaCodec.BmpImage(base.width, base.height, light)))
    assert(dLight <= 6, s"light edit moved $dLight bits")
    // a different seed: effectively uncorrelated -> many bits differ
    val other = MediaCodec.decodeBmp(MediaCodec.synthBmpSeeded(400L))
    val dOther = hamming(MediaCodec.dhashChunks(base), MediaCodec.dhashChunks(other))
    assert(dOther > 10, s"distinct images only $dOther bits apart")
  }

  // ------------------------------------------------------------- AVI

  test("avi round trip recovers geometry, timing and every frame pixel") {
    val rnd = new scala.util.Random(17L)
    val w = 13; val h = 7; val n = 5                 // odd width -> stride padding
    val frameData = Array.fill(n)(Array.fill(w * h)(rnd.nextInt(0x1000000)))
    val bytes = MediaCodec.encodeAvi(w, h, 40000,
      frameData.toIndexedSeq.map(fd => (x: Int, y: Int) => fd(y * w + x)))
    val v = MediaCodec.decodeAvi(bytes)
    assert(v != null && v.width == w && v.height == h && v.usPerFrame == 40000)
    assert(v.frames.length == n)
    (0 until n).foreach(f => assert(v.frames(f).sameElements(frameData(f)),
      s"frame $f pixels differ"))
  }

  test("avi decode rejects corrupt input with null") {
    val good = MediaCodec.synthAvi(5L)
    assert(MediaCodec.decodeAvi(null) == null)
    assert(MediaCodec.decodeAvi(good.take(11)) == null)
    val notAvi = good.clone(); notAvi(8) = 'X'.toByte
    assert(MediaCodec.decodeAvi(notAvi) == null)
    assert(MediaCodec.decodeAvi(good.take(good.length - 10)) == null) // truncated frame
    // frame chunk size disagreeing with geometry (as if compressed) -> null
    val v = MediaCodec.decodeAvi(good)
    assert(v != null && v.frames.nonEmpty)
  }

  // ------------------------------------------------ audio fingerprint

  test("audio fingerprint groups content-identical clips that byte hashing cannot") {
    val even = MediaCodec.synthWavSeeded(10L)
    val odd = MediaCodec.synthWavSeeded(11L)     // same PCM + LIST chunk
    assert(!even.sameElements(odd), "partners must be byte-distinct")
    assert(java.util.Arrays.hashCode(even) != java.util.Arrays.hashCode(odd))
    val fpEven = MediaCodec.audioFingerprint(MediaCodec.decodeWav(even))
    val fpOdd = MediaCodec.audioFingerprint(MediaCodec.decodeWav(odd))
    assert(fpEven === fpOdd, "content fingerprint must see through the container")
    val otherSeed = MediaCodec.audioFingerprint(
      MediaCodec.decodeWav(MediaCodec.synthWavSeeded(12L)))
    assert(fpEven !== otherSeed, "different content must not collide")
  }

  // ------------------------------------------------- expressions + SQL

  test("decode expressions agree between Column API and SQL registration") {
    import spark.implicits._
    val df = spark.range(0, 50).toDF("doc_id")
    val viaCol = df.select(
      GraftFunctions.bmpDecodeStats(GraftFunctions.synthBmp($"doc_id"), 16, 16)
        .as("b"),
      GraftFunctions.wavDecodeStats(GraftFunctions.synthWav($"doc_id")).as("w"))
      .selectExpr("b.width", "b.pixel_sum", "b.resized_sum",
        "w.sample_rate", "w.energy")
    df.createOrReplaceTempView("media_ids")
    val viaSql = spark.sql(
      """SELECT b.width, b.pixel_sum, b.resized_sum, w.sample_rate, w.energy
        |FROM (SELECT bmp_decode_stats(synth_bmp(doc_id), 16, 16) AS b,
        |             wav_decode_stats(synth_wav(doc_id)) AS w
        |      FROM media_ids)""".stripMargin)
    assert(viaCol.collect().toSeq == viaSql.collect().toSeq)
  }

  test("corrupt blobs yield null structs through the expression (absent semantics)") {
    import spark.implicits._
    val rows = Seq(Array[Byte](1, 2, 3), null).toDF("blob")
      .select(GraftFunctions.bmpDecodeStats($"blob", 4, 4).as("b"),
        GraftFunctions.wavDecodeStats($"blob").as("w"))
      .collect()
    assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  // ------------------------------------------------- golden wire fixtures
  // Every byte hand-written from the public specs, every expected value
  // hand-computed — the decoders are judged against fixtures that no repo
  // encoder produced, so a mirrored encode/decode bug cannot pass here.

  test("golden BMP bytes decode to the hand-computed image") {
    val img = MediaCodec.decodeBmp(MediaCodec.fromHex(MediaCodec.GoldenBmpHex))
    assert(img != null)
    assert(img.width == 3 && img.height == 2)
    // top-down pixels as authored in the (bottom-up) byte rows
    assert(img.pixel(0, 0) == 0xFF0000)
    assert(img.pixel(1, 0) == 0x00FF00)
    assert(img.pixel(2, 0) == 0x0000FF)
    assert(img.pixel(0, 1) == 0xFFFFFF)
    assert(img.pixel(1, 1) == 0x000000)
    assert(img.pixel(2, 1) == 0x123456)
    // channel mass: 3*255 (r,g,b rows) + 765 (white) + 0 + (18+52+86)
    assert(img.pixels.map(p =>
      ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).sum == 1686)
    // 16x16 nearest resize: srcX counts 6/5/5, srcY counts 8/8
    val rz = MediaCodec.resizeNearest(img, 16, 16)
    assert(rz.map(p =>
      ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).sum.toLong == 75600L)
  }

  test("golden WAV bytes decode to the hand-computed clip") {
    val clip = MediaCodec.decodeWav(MediaCodec.fromHex(MediaCodec.GoldenWavHex))
    assert(clip != null)
    assert(clip.sampleRate == 8000 && clip.channels == 1 && clip.bitsPerSample == 16)
    assert(clip.samples.toSeq == Seq[Short](1, -1, 32767, -32768))
  }

  test("golden AVI bytes decode to the hand-computed video") {
    val v = MediaCodec.decodeAvi(MediaCodec.fromHex(MediaCodec.GoldenAviHex))
    assert(v != null)
    assert(v.width == 2 && v.height == 1 && v.usPerFrame == 40000)
    assert(v.frames.length == 1)
    assert(v.frames(0).toSeq == Seq(0x112233, 0x445566))
  }

  test("golden fixtures reject mutation: truncation, magic, geometry") {
    val bmp = MediaCodec.fromHex(MediaCodec.GoldenBmpHex)
    val wav = MediaCodec.fromHex(MediaCodec.GoldenWavHex)
    val avi = MediaCodec.fromHex(MediaCodec.GoldenAviHex)
    assert(MediaCodec.decodeBmp(bmp.dropRight(1)) == null)  // truncated pixels
    assert(MediaCodec.decodeWav(wav.dropRight(1)) == null)  // truncated data chunk
    val badMagic = bmp.clone(); badMagic(0) = 'X'.toByte
    assert(MediaCodec.decodeBmp(badMagic) == null)
    val badWidth = bmp.clone(); badWidth(18) = 5  // width 5: stride overruns file
    assert(MediaCodec.decodeBmp(badWidth) == null)
    val badRiff = wav.clone(); badRiff(0) = 'X'.toByte
    assert(MediaCodec.decodeWav(badRiff) == null)
    val badAviW = avi.clone(); badAviW(64) = 3    // avih width 3: frame size mismatch
    assert(MediaCodec.decodeAvi(badAviW) == null)
  }

  test("hostile avih dimensions that wrap Int arithmetic return null, not a crash") {
    // width 0x55555556: 3*w wraps to 2 in Int, stride wraps to 4, and with
    // height 2 the wrapped stride*height equals the declared frame size (8)
    // — the false-pass ADVICE flagged; w*h also wraps negative, so the
    // pixel allocation would throw NegativeArraySizeException unguarded
    val avi = MediaCodec.fromHex(MediaCodec.GoldenAviHex)
    avi(64) = 0x56.toByte; avi(65) = 0x55.toByte
    avi(66) = 0x55.toByte; avi(67) = 0x55.toByte   // width = 0x55555556
    avi(68) = 2; avi(69) = 0; avi(70) = 0; avi(71) = 0 // height = 2
    assert(MediaCodec.decodeAvi(avi) == null)
  }
}
