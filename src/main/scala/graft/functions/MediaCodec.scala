package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal column model (SURVEY.md
  * training-pipeline extensions): real byte-level BMP and WAV (RIFF/PCM)
  * container parsing, no external image/audio libraries.
  *
  * The container formats are chosen precisely because they are fully
  * specified, dependency-free and uncompressed: the Windows BMP format
  * (BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp BI_RGB) and the RIFF WAVE
  * format (fmt/data chunks, 16-bit PCM). That makes the decode step REAL —
  * the operator parses actual header bytes, walks actual chunk lists,
  * unpacks actual pixel/sample payloads — while staying honest about the
  * sandbox (no JPEG/PNG/MP4 codecs are present; those would slot in behind
  * the same byte-in/struct-out contract).
  *
  * Malformed input returns null from every decode entry point — the
  * absent-semantics convention used across the mapping DSL (a corrupt blob
  * yields absent metadata, never an exception that kills the stage).
  */
object MediaCodec {

  final case class BmpImage(width: Int, height: Int, pixels: Array[Int]) {
    /** 0xRRGGBB at (x, y), top-down row-major. */
    def pixel(x: Int, y: Int): Int = pixels(y * width + x)
  }

  final case class WavClip(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Short])

  // ------------------------------------------------------------------ BMP

  /** Encode a 24bpp bottom-up BI_RGB BMP. `pixel(x, y)` returns 0xRRGGBB
    * with (0,0) the TOP-left corner (rows are written bottom-up as the
    * format requires). */
  def encodeBmp(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "bmp dims must be positive")
    val stride = (width * 3 + 3) & ~3
    val imageSize = stride * height
    val fileSize = 54 + imageSize
    val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(imageSize)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = height - 1
    while (row >= 0) {
      var x = 0
      while (x < width) {
        val p = pixel(x, row)
        buf.put((p & 0xff).toByte)            // B
        buf.put(((p >> 8) & 0xff).toByte)     // G
        buf.put(((p >> 16) & 0xff).toByte)    // R
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0: Byte); pad -= 1 }
      row -= 1
    }
    buf.array()
  }

  /** Decode a 24bpp uncompressed BMP (positive height = bottom-up, negative
    * = top-down; both occur in the wild). Returns null on anything
    * malformed: wrong magic, truncated header, unsupported bpp/compression,
    * or a pixel array that runs past the buffer. */
  def decodeBmp(bytes: Array[Byte]): BmpImage = {
    if (bytes == null || bytes.length < 54) return null
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.get(0) != 'B' || buf.get(1) != 'M') return null
    val dataOffset = buf.getInt(10)
    val headerSize = buf.getInt(14)
    if (headerSize < 40) return null
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    if (width <= 0 || rawHeight == 0 || bpp != 24 || compression != 0) return null
    val topDown = rawHeight < 0
    // LONG geometry end to end: a hostile width (e.g. 0x2B00000D) overflows
    // `width * 3` in int, producing a small/negative stride that slips past
    // an int bounds check and crashes the pixel loop (found by CodecFuzzSpec
    // single-byte mutation; same bug class as the decodeAvi dimensions fix);
    // abs(0x80000000) is likewise still negative in int. After this check
    // stride, height, width*height and every row offset fit int.
    val heightL = math.abs(rawHeight.toLong)
    val strideL = (width.toLong * 3 + 3) & ~3L
    if (dataOffset < 54 || dataOffset.toLong + strideL * heightL > bytes.length)
      return null
    val stride = strideL.toInt
    val height = heightL.toInt
    val pixels = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var off = dataOffset + srcRow * stride
      var x = 0
      while (x < width) {
        val b = bytes(off) & 0xff
        val g = bytes(off + 1) & 0xff
        val r = bytes(off + 2) & 0xff
        pixels(y * width + x) = (r << 16) | (g << 8) | b
        off += 3
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, pixels)
  }

  /** Nearest-neighbour resample to `outW`×`outH` (the thumbnailer kernel;
    * integer source mapping `srcX = x*W/outW` so any replayed oracle
    * agrees bit-exactly). */
  def resizeNearest(img: BmpImage, outW: Int, outH: Int): Array[Int] = {
    val out = new Array[Int](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * img.height / outH
      var x = 0
      while (x < outW) {
        out(y * outW + x) = img.pixel(x * img.width / outW, sy)
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------------ WAV

  /** Encode a mono/stereo 16-bit PCM RIFF WAVE file (44-byte canonical
    * header + interleaved little-endian samples). */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "wav params must be positive")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)                       // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Decode a RIFF WAVE container: walks the chunk list generically
    * (unknown chunks — LIST/INFO/fact — are skipped by their declared
    * size, as a real reader must), requires a PCM `fmt ` chunk with
    * 16-bit samples, and unpacks the `data` payload. Null on malformed
    * or unsupported input. */
  def decodeWav(bytes: Array[Byte]): WavClip = {
    if (bytes == null || bytes.length < 44) return null
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return null
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var fmtSeen = false
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos + 8 + size.toLong > bytes.length) return null
      id match {
        case "fmt " =>
          if (size < 16) return null
          val audioFormat = buf.getShort(pos + 8)
          channels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22)
          if (audioFormat != 1 || bits != 16 || channels <= 0 || sampleRate <= 0)
            return null
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) return null     // fmt must precede data
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
        case _ => ()                    // skip LIST/fact/bext/...
      }
      pos += 8 + size + (size & 1)      // RIFF chunks are word-aligned
    }
    if (!fmtSeen || samples == null) return null
    WavClip(sampleRate, channels, bits, samples)
  }

  private def tag(bytes: Array[Byte], off: Int): String =
    new String(bytes, off, 4, "US-ASCII")

  /** Splice a LIST metadata chunk between `fmt ` and `data` of a canonical
    * 44-byte-header WAV — byte-level different, content-identical (the
    * decoder skips LIST). Word-pads odd bodies per RIFF. */
  def withListChunk(wav: Array[Byte], body: Array[Byte]): Array[Byte] = {
    require(wav.length >= 44 && tag(wav, 0) == "RIFF", "canonical wav expected")
    val pad = body.length & 1
    val out = ByteBuffer.allocate(wav.length + 8 + body.length + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(wav, 0, 36)                     // RIFF..WAVE + fmt chunk
    out.put("LIST".getBytes("US-ASCII")).putInt(body.length).put(body)
    if (pad == 1) out.put(0: Byte)
    out.put(wav, 36, wav.length - 36)       // data chunk
    val bytes = out.array()
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).putInt(4, bytes.length - 8)
    bytes
  }

  /** Audio content fingerprint of a decoded clip: 16 equal sample windows
    * (integer boundaries `w*n/16`), per-window energy Σs², one bit per
    * adjacent-window energy gradient (bit w set iff `E(w+1) > E(w)`) — a
    * 15-bit loudness-envelope signature, robust to container-level byte
    * differences because it sees only DECODED samples. */
  def audioFingerprint(clip: WavClip): (Int, Long) = {
    val n = clip.samples.length
    if (n == 0) return (0, 0L)
    val energies = new Array[Long](16)
    // sample i belongs to window floor(i*16/n) — the one integer mapping
    // both this kernel and any SQL replay can state identically
    var i = 0
    while (i < n) {
      val s = clip.samples(i).toLong
      energies((i.toLong * 16 / n).toInt) += s * s
      i += 1
    }
    var sig = 0
    var total = 0L
    var w = 0
    while (w < 16) { total += energies(w); w += 1 }
    w = 0
    while (w < 15) {
      if (energies(w + 1) > energies(w)) sig |= 1 << w
      w += 1
    }
    (sig, total)
  }

  // ------------------------------------------------------------------ AVI

  final case class AviVideo(
      width: Int, height: Int, usPerFrame: Int,
      frames: Array[Array[Int]]) // per frame: 0xRRGGBB top-down row-major

  /** Encode an uncompressed-DIB AVI (RIFF `AVI ` → LIST hdrl [avih + one
    * `vids`/`DIB ` stream] → LIST movi [`00db` frames]). Frame payloads are
    * BMP-style bottom-up rows with 4-byte stride padding. */
  def encodeAvi(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0 && frames.nonEmpty,
      "avi params must be positive")
    val stride = (width * 3 + 3) & ~3
    val frameSize = stride * height
    def fourcc(buf: ByteBuffer, s: String): Unit =
      buf.put(s.getBytes("US-ASCII"))
    val hdrlSize = 4 + 8 + 56 + 8 + 4 + 8 + 56 + 8 + 40 // 'hdrl' avih LIST(strl strh strf)
    val moviSize = 4 + frames.length * (8 + frameSize)
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    fourcc(buf, "RIFF"); buf.putInt(riffSize); fourcc(buf, "AVI ")
    fourcc(buf, "LIST"); buf.putInt(hdrlSize); fourcc(buf, "hdrl")
    fourcc(buf, "avih"); buf.putInt(56)
    buf.putInt(usPerFrame).putInt(frameSize * 1000000 / usPerFrame)
    buf.putInt(0).putInt(0)
    buf.putInt(frames.length).putInt(0).putInt(1).putInt(frameSize)
    buf.putInt(width).putInt(height)
    buf.putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc(buf, "LIST"); buf.putInt(4 + 8 + 56 + 8 + 40); fourcc(buf, "strl")
    fourcc(buf, "strh"); buf.putInt(56)
    fourcc(buf, "vids"); fourcc(buf, "DIB ")
    buf.putInt(0).putInt(0).putInt(0)
    buf.putInt(usPerFrame).putInt(1000000)        // scale/rate -> fps
    buf.putInt(0).putInt(frames.length).putInt(frameSize)
    buf.putInt(-1).putInt(0)
    buf.putShort(0).putShort(0)
    buf.putShort(width.toShort).putShort(height.toShort)
    fourcc(buf, "strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height)
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(frameSize)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    fourcc(buf, "LIST"); buf.putInt(moviSize); fourcc(buf, "movi")
    frames.foreach { pixel =>
      fourcc(buf, "00db"); buf.putInt(frameSize)
      var row = height - 1
      while (row >= 0) {
        var x = 0
        while (x < width) {
          val p = pixel(x, row)
          buf.put((p & 0xff).toByte)
          buf.put(((p >> 8) & 0xff).toByte)
          buf.put(((p >> 16) & 0xff).toByte)
          x += 1
        }
        var pad = stride - width * 3
        while (pad > 0) { buf.put(0: Byte); pad -= 1 }
        row -= 1
      }
    }
    buf.array()
  }

  /** Decode an uncompressed-DIB AVI: walks the top-level chunk list, the
    * hdrl LIST for `avih` (geometry + frame timing) and the movi LIST for
    * `00db`/`00dc` frame payloads — nested RIFF traversal, unknown chunks
    * (idx1, JUNK, other streams) skipped by declared size. Null on
    * malformed or compressed input. */
  def decodeAvi(bytes: Array[Byte]): AviVideo = {
    if (bytes == null || bytes.length < 12) return null
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return null
    var width = 0
    var height = 0
    var usPerFrame = 0
    var declaredFrames = 0
    var avihSeen = false
    val frames = scala.collection.mutable.ArrayBuffer[Array[Int]]()

    def walkMovi(start: Int, end: Int): Boolean = {
      var pos = start
      while (pos + 8 <= end) {
        val id = tag(bytes, pos)
        val size = buf.getInt(pos + 4)
        if (size < 0 || pos + 8 + size.toLong > end) return false
        if (id == "LIST" && size >= 4 && tag(bytes, pos + 8) == "rec ") {
          // frames may be grouped in 'rec ' sub-lists — recurse
          if (!walkMovi(pos + 12, pos + 8 + size)) return false
        } else if (id.endsWith("db") || id.endsWith("dc")) {
          if (!avihSeen) return false
          val stride = (width * 3 + 3) & ~3
          if (size != stride * height) return false   // compressed / wrong geometry
          val pixels = new Array[Int](width * height)
          var y = 0
          while (y < height) {
            var off = pos + 8 + (height - 1 - y) * stride
            var x = 0
            while (x < width) {
              pixels(y * width + x) =
                ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 1) & 0xff) << 8) |
                  (bytes(off) & 0xff)
              off += 3
              x += 1
            }
            y += 1
          }
          frames += pixels
        }
        pos += 8 + size + (size & 1)
      }
      true
    }

    def walk(start: Int, end: Int): Boolean = {
      var pos = start
      while (pos + 8 <= end) {
        val id = tag(bytes, pos)
        val size = buf.getInt(pos + 4)
        if (size < 0 || pos + 8 + size.toLong > end) return false
        id match {
          case "LIST" =>
            if (size < 4) return false
            val subtype = tag(bytes, pos + 8)
            val ok = subtype match {
              case "hdrl" => walk(pos + 12, pos + 8 + size)
              case "movi" => walkMovi(pos + 12, pos + 8 + size)
              case _ => true                          // strl handled via hdrl walk; INFO etc. skipped
            }
            if (!ok) return false
          case "avih" =>
            if (size < 56) return false
            usPerFrame = buf.getInt(pos + 8)
            declaredFrames = buf.getInt(pos + 24)
            width = buf.getInt(pos + 40)
            height = buf.getInt(pos + 44)
            if (width <= 0 || height <= 0 || usPerFrame <= 0) return false
            // Hostile-header bound: stride/pixel-count arithmetic below runs
            // in Int, so huge declared dims would wrap (false size match,
            // NegativeArraySizeException). One frame can't exceed the input,
            // and the pixel array must index as Int.
            val strideL = (3L * width + 3L) & ~3L
            if (strideL * height > bytes.length.toLong ||
                width.toLong * height > Int.MaxValue) return false
            avihSeen = true
          case _ => ()                                // strh/strf/idx1/JUNK
        }
        pos += 8 + size + (size & 1)
      }
      true
    }

    if (!walk(12, bytes.length)) return null
    if (!avihSeen || frames.isEmpty) return null
    if (declaredFrames > 0 && frames.length != declaredFrames) return null
    AviVideo(width, height, usPerFrame, frames.toArray)
  }

  // ------------------------------------------ deterministic demo payloads

  /** Deterministic synthetic BMP for document `k` — REAL container bytes
    * whose geometry and pixels are integer functions of `k`, so a SQL
    * oracle can replay what the decoder must recover. (The fixture corpus
    * carries no binary media; synthesis-then-real-decode keeps the decoder
    * the honest system under test.) */
  def synthBmp(k: Long): Array[Byte] = {
    val w = (16 + Math.floorMod(k * 5, 48)).toInt
    val h = (16 + Math.floorMod(k * 7, 48)).toInt
    encodeBmp(w, h, (x, y) => {
      val r = Math.floorMod(x * 3 + y * 5 + k, 256).toInt
      val g = Math.floorMod(x * 7 + y + 2 * k, 256).toInt
      val b = Math.floorMod(x + y * 11 + 3 * k, 256).toInt
      (r << 16) | (g << 8) | b
    })
  }

  /** Difference-hash (dHash) of a decoded image: nearest-resample to 9×8,
    * integer BT.601 luma `(299r + 587g + 114b) / 1000`, then one bit per
    * horizontal luma gradient (`luma(x+1,y) > luma(x,y)`), packed into 4
    * little-endian 16-bit chunks (bit index `y*8 + x`). Chunked — not one
    * long — because the near-dup join blocks on chunk equality (pigeonhole:
    * Hamming ≤ 3 ⇒ some chunk is identical, same exactness argument as the
    * SimHash blocking) and 16-bit values replay exactly in any SQL engine
    * without signed-bit-63 contortions. */
  def dhashChunks(img: BmpImage): Array[Int] = {
    val resized = resizeNearest(img, 9, 8)
    val luma = new Array[Int](9 * 8)
    var i = 0
    while (i < luma.length) {
      val p = resized(i)
      luma(i) = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
        (p & 0xff) * 114) / 1000
      i += 1
    }
    val chunks = new Array[Int](4)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(y * 9 + x + 1) > luma(y * 9 + x)) {
          val idx = y * 8 + x
          chunks(idx >> 4) |= 1 << (idx & 15)
        }
        x += 1
      }
      y += 1
    }
    chunks
  }

  /** Seeded synthetic BMP: documents `2s` and `2s+1` share seed `s` and so
    * carry byte-identical images — planted exact-duplicate PAIRS for the
    * perceptual-hash dedup (linear in corpus size, never quadratic).
    * Pixels are nonlinear integer forms of (x, y, s) so different seeds
    * produce effectively uncorrelated gradient bits. */
  def synthBmpSeeded(k: Long): Array[Byte] = {
    val s = k / 2
    val w = (16 + Math.floorMod(s * 5, 48)).toInt
    val h = (16 + Math.floorMod(s * 7, 48)).toInt
    encodeBmp(w, h, (x, y) => {
      val r = Math.floorMod((x + s) * (y + 2 * s) + x.toLong * x, 256).toInt
      val g = Math.floorMod((2 * x + s) * (y + s) + y.toLong * y, 256).toInt
      val b = Math.floorMod(x.toLong * y + s * s + 3 * x, 256).toInt
      (r << 16) | (g << 8) | b
    })
  }

  /** Deterministic synthetic AVI for document `k`: REAL container bytes —
    * geometry, frame count, timing and per-frame pixels are integer
    * functions of `k` so a SQL oracle replays what the parser must
    * recover. */
  def synthAvi(k: Long): Array[Byte] = {
    val w = (16 + Math.floorMod(k, 3) * 8).toInt
    val h = (12 + Math.floorMod(k, 5) * 4).toInt
    val n = (4 + Math.floorMod(k, 8)).toInt
    val usPerFrame = (33333 + Math.floorMod(k, 4) * 8333).toInt
    val frames = (0 until n).map { f => (x: Int, y: Int) =>
      val r = Math.floorMod(x * 3 + y * 5 + f * 11 + k, 256).toInt
      val g = Math.floorMod(x * 7 + y + f * 3 + 2 * k, 256).toInt
      val b = Math.floorMod(x + y * 11 + f * 7 + 3 * k, 256).toInt
      (r << 16) | (g << 8) | b
    }
    encodeAvi(w, h, usPerFrame, frames)
  }

  /** Seeded synthetic WAV: documents `2s` and `2s+1` share seed `s` and
    * carry IDENTICAL PCM content, but the odd partner additionally gets a
    * LIST metadata chunk spliced in — byte-level distinct, content-equal.
    * Exactly the pair a content fingerprint must group and a byte hash
    * cannot. */
  def synthWavSeeded(k: Long): Array[Byte] = {
    val canonical = synthWav(k / 2)
    if ((k & 1L) == 0L) canonical
    else withListChunk(canonical,
      s"INFOISFT tagged-copy-${k / 2}".getBytes("US-ASCII"))
  }

  /** Deterministic synthetic WAV for document `k` (mono 16-bit PCM;
    * rate cycles 8/16/44.1 kHz; `sample(i) = (i*31 + k*17) % 4096 - 2048`). */
  def synthWav(k: Long): Array[Byte] = {
    val n = (400 + Math.floorMod(k, 17) * 100).toInt
    val rate = (Math.floorMod(k, 3): @unchecked) match {
      case 0 => 8000
      case 1 => 16000
      case 2 => 44100
    }
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = (Math.floorMod(i * 31 + k * 17, 4096) - 2048).toShort
      i += 1
    }
    encodeWav(rate, 1, samples)
  }

  // ------------------------------------------------- golden wire fixtures
  /** HAND-AUTHORED container bytes (hex), written field-by-field from the
    * public format specs — NOT produced by the encoders above. They break
    * the encode/decode self-agreement loop: a mirrored encoder+decoder bug
    * would still agree on synthesized payloads, but cannot reproduce these
    * bytes' independently hand-computed stats (pinned in MediaCodecSpec
    * and the `media_golden_decode` oracle).
    *
    * GoldenBmp: 3x2 bottom-up 24bpp BI_RGB, stride 12 (3-byte pad).
    * Top-down pixels: (FF0000, 00FF00, 0000FF) / (FFFFFF, 000000, 123456).
    * GoldenWav: canonical 44-byte RIFF/WAVE, mono 8 kHz 16-bit, samples
    * [1, -1, 32767, -32768].
    * GoldenAvi: RIFF/AVI, hdrl(avih 56 B: 40000 us/frame, 1 frame, 2x1)
    * + movi(one 00db frame, stride 8), pixels (112233, 445566). */
  val GoldenBmpHex: String =
    "424D4E0000000000000036000000280000000300000002000000010018000000" +
    "000018000000130B0000130B00000000000000000000" +
    "FFFFFF000000563412000000" +  // bottom row (top-down y=1) + pad
    "0000FF00FF00FF0000000000"    // top row + pad

  val GoldenWavHex: String =
    "524946462C00000057415645666D74201000000001000100401F0000803E0000" +
    "02001000" +
    "646174610800000001" + "00FFFFFF7F0080"

  val GoldenAviHex: String =
    "52494646" + "6C000000" + "41564920" +
    "4C495354" + "44000000" + "6864726C" +
    "61766968" + "38000000" +
      "409C0000" + "00000000" + "00000000" + "00000000" +  // usPerFrame 40000
      "01000000" + "00000000" + "01000000" + "00000000" +  // totalFrames 1
      "02000000" + "01000000" +                            // width 2, height 1
      "00000000" * 4 +                                     // reserved
    "4C495354" + "14000000" + "6D6F7669" +
    "30306462" + "08000000" + "332211665544" + "0000"

  def fromHex(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
}
