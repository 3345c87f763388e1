package graft.ext

/** Dependency-free media codecs for the multimodal family: 24-bit BMP,
  * P6 PPM, and PCM16 WAV — real byte-level format parsing, not a stub
  * (r7 VERDICT #4 replaced [[Multimodal]]'s `FakeDecoder`). This
  * container ships no image/audio libraries, so the formats chosen are
  * the three classic ones whose specs are simple enough to implement
  * from scratch: BMP (Windows BITMAPINFOHEADER layout), PPM (netpbm P6),
  * RIFF/WAVE PCM.
  *
  * The ENCODERS synthesize deterministic fixtures from a doc_id: pixel /
  * sample values come from closed-form integer formulas that the DuckDB
  * oracles re-evaluate independently (`OracleSql` multimodal entries), so
  * the gate checks the real decode path end-to-end — and the encoders
  * plant the formats' classic decode traps on purpose:
  *  - BMP rows are stored BOTTOM-UP and row-padded to 4 bytes, with the
  *    padding filled with 0xAB junk: a decoder that averages raw data
  *    bytes, or forgets the row flip, produces stats the oracle rejects;
  *  - the WAV carries a junk `LIST` chunk BEFORE `fmt `: a decoder that
  *    assumes fixed header offsets instead of walking RIFF chunks breaks;
  *  - PPM has a whitespace-token ASCII header in front of binary data.
  *
  * All decoders validate magic/layout with `require` — malformed payloads
  * fail loudly rather than produce plausible numbers.
  */
object MediaCodecs {

  // ---- little-endian byte helpers (shared by all three formats) ----
  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def s16(b: Array[Byte], p: Int): Int = u16(b, p).toShort.toInt
  private def i32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def putU16(b: Array[Byte], p: Int, v: Int): Unit = {
    b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putI32(b: Array[Byte], p: Int, v: Int): Unit = {
    b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
    b(p + 2) = ((v >> 16) & 0xff).toByte; b(p + 3) = ((v >> 24) & 0xff).toByte
  }
  private def putTag(b: Array[Byte], p: Int, tag: String): Unit = {
    var i = 0; while (i < 4) { b(p + i) = tag.charAt(i).toByte; i += 1 }
  }

  /** A decoded raster in IMAGE (top-down) coordinates; `px` is row-major
    * (y, x, channel) with 3 channels per pixel, values 0–255.
    */
  final case class Raster(width: Int, height: Int, px: Array[Int]) {
    def channel(x: Int, y: Int, c: Int): Int = px((y * width + x) * 3 + c)
    /** Mean over all pixel channel values. */
    def meanAll: Double = {
      if (px.isEmpty) return 0.0
      var s = 0L; var i = 0
      while (i < px.length) { s += px(i); i += 1 }
      s.toDouble / px.length
    }
    /** Mean of one channel over all pixels. */
    def meanChannel(c: Int): Double = {
      val n = width * height
      if (n == 0) return 0.0
      var s = 0L; var i = c
      while (i < px.length) { s += px(i); i += 3 }
      s.toDouble / n
    }
  }

  // =========================== BMP ===========================
  // Fixture formulas — mirrored verbatim by the multimodal_features /
  // multimodal_resize DuckDB oracles; change both together or the gate
  // hash-mismatches.
  def bmpWidth(id: Long): Int = 4 + (id % 13).toInt
  def bmpHeight(id: Long): Int = 3 + (id % 11).toInt
  def bmpChannel(id: Long, x: Int, y: Int, c: Int): Int =
    ((id * 7 + y * 31L + x * 3L + c * 11L) % 256).toInt
  def bmpRowSize(w: Int): Int = ((3 * w + 3) / 4) * 4

  /** A valid 24-bit BI_RGB BMP: 54-byte header, bottom-up rows, 4-byte
    * row padding filled with 0xAB junk (see object doc).
    */
  def encodeBmp(id: Long): Array[Byte] = {
    val w = bmpWidth(id); val h = bmpHeight(id)
    val rowSize = bmpRowSize(w)
    val out = new Array[Byte](54 + rowSize * h)
    out(0) = 'B'; out(1) = 'M'
    putI32(out, 2, out.length)
    putI32(out, 10, 54)        // pixel-data offset
    putI32(out, 14, 40)        // BITMAPINFOHEADER
    putI32(out, 18, w)
    putI32(out, 22, h)         // positive height → bottom-up rows
    putU16(out, 26, 1)         // planes
    putU16(out, 28, 24)        // bits per pixel
    putI32(out, 30, 0)         // BI_RGB (uncompressed)
    putI32(out, 34, rowSize * h)
    putI32(out, 38, 2835); putI32(out, 42, 2835) // 72 dpi
    var fr = 0
    while (fr < h) {
      val y = h - 1 - fr // image row stored at file row (h-1-y)
      val base = 54 + fr * rowSize
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          out(base + x * 3 + c) = bmpChannel(id, x, y, c).toByte; c += 1
        }
        x += 1
      }
      var p = base + 3 * w
      while (p < base + rowSize) { out(p) = 0xAB.toByte; p += 1 } // junk pad
      fr += 1
    }
    out
  }

  /** Parse a 24-bit uncompressed bottom-up BMP from its actual header
    * fields (offset, dims, bpp) — flipping rows to image order and
    * skipping row padding.
    */
  def decodeBmp(b: Array[Byte]): Raster = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP payload")
    val offset = i32(b, 10)
    require(i32(b, 14) >= 40, s"unsupported BMP header size ${i32(b, 14)}")
    val w = i32(b, 18)
    val h = i32(b, 22)
    require(w > 0 && h > 0, "top-down (negative-height) BMP not supported")
    require(u16(b, 28) == 24, s"unsupported bpp ${u16(b, 28)} (24-bit only)")
    require(i32(b, 30) == 0, "compressed BMP not supported")
    val rowSize = bmpRowSize(w)
    require(b.length >= offset + rowSize * h, "truncated BMP pixel data")
    val px = new Array[Int](w * h * 3)
    var fr = 0
    while (fr < h) {
      val y = h - 1 - fr
      val base = offset + fr * rowSize
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          px((y * w + x) * 3 + c) = b(base + x * 3 + c) & 0xff; c += 1
        }
        x += 1
      }
      fr += 1
    }
    Raster(w, h, px)
  }

  /** Nearest-neighbour ×2 downscale: keep image pixels with even x and
    * even y (so new dims are ceil(dim/2)). Operating in IMAGE coordinates
    * is the point — a decoder that forgot BMP's bottom-up storage picks
    * the wrong rows here and fails the oracle.
    */
  def downscale2(r: Raster): Raster = {
    val nw = (r.width + 1) / 2; val nh = (r.height + 1) / 2
    val out = new Array[Int](nw * nh * 3)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        var c = 0
        while (c < 3) {
          out((y * nw + x) * 3 + c) = r.channel(2 * x, 2 * y, c); c += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(nw, nh, out)
  }

  // =========================== WAV ===========================
  val WavRate = 8000
  def wavSamples(id: Long): Int = 32 + (id % 33).toInt
  def wavSample(id: Long, i: Int): Int =
    (((id * 13 + i.toLong * 97) % 2001) - 1000).toInt

  /** A valid RIFF/WAVE PCM16 mono payload with a junk `LIST` chunk ahead
    * of `fmt ` (see object doc).
    */
  def encodeWav(id: Long): Array[Byte] = {
    val n = wavSamples(id)
    val junk = 6
    val riffBody = 4 + (8 + junk) + (8 + 16) + (8 + 2 * n)
    val out = new Array[Byte](8 + riffBody)
    putTag(out, 0, "RIFF"); putI32(out, 4, riffBody)
    putTag(out, 8, "WAVE")
    var p = 12
    putTag(out, p, "LIST"); putI32(out, p + 4, junk)
    var j = 0; while (j < junk) { out(p + 8 + j) = 0xEE.toByte; j += 1 }
    p += 8 + junk
    putTag(out, p, "fmt "); putI32(out, p + 4, 16)
    putU16(out, p + 8, 1)                 // PCM
    putU16(out, p + 10, 1)                // mono
    putI32(out, p + 12, WavRate)
    putI32(out, p + 16, WavRate * 2)      // byte rate
    putU16(out, p + 20, 2)                // block align
    putU16(out, p + 22, 16)               // bits per sample
    p += 8 + 16
    putTag(out, p, "data"); putI32(out, p + 4, 2 * n)
    var i = 0
    while (i < n) { putU16(out, p + 8 + 2 * i, wavSample(id, i) & 0xffff); i += 1 }
    out
  }

  /** Decoded PCM stream. */
  final case class Pcm(sampleRate: Int, samples: Array[Int]) {
    def rms: Double = {
      if (samples.isEmpty) return 0.0
      var s = 0L; var i = 0
      while (i < samples.length) { s += samples(i).toLong * samples(i); i += 1 }
      math.sqrt(s.toDouble / samples.length)
    }
    def peak: Long = {
      var m = 0L; var i = 0
      while (i < samples.length) { m = math.max(m, math.abs(samples(i).toLong)); i += 1 }
      m
    }
  }

  /** RIFF chunk walk: skip unknown chunks (word-aligned), read `fmt `,
    * decode PCM16 mono samples from `data`.
    */
  def decodeWav(b: Array[Byte]): Pcm = {
    require(b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E',
      "not a RIFF/WAVE payload")
    var pos = 12
    var rate = -1; var bits = -1; var channels = -1
    var data: Array[Int] = null
    while (pos + 8 <= b.length) {
      val tag = new String(b, pos, 4, "US-ASCII")
      val sz = i32(b, pos + 4)
      val body = pos + 8
      require(sz >= 0 && body + sz <= b.length, s"truncated RIFF chunk $tag")
      tag match {
        case "fmt " =>
          require(u16(b, body) == 1, "only PCM (format 1) supported")
          channels = u16(b, body + 2)
          rate = i32(b, body + 4)
          bits = u16(b, body + 14)
        case "data" =>
          require(bits == 16 && channels == 1,
            "fmt chunk must precede data; PCM16 mono only")
          val n = sz / 2
          val s = new Array[Int](n)
          var i = 0; while (i < n) { s(i) = s16(b, body + 2 * i); i += 1 }
          data = s
        case _ => () // unknown chunk (e.g. the junk LIST) — skip
      }
      pos = body + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    require(data != null, "no data chunk in WAVE payload")
    Pcm(rate, data)
  }

  /** Split a PCM stream into `nFrames` equal windows of floor(n/nFrames)
    * samples (remainder dropped — mirrored by the oracle) and return
    * (frame_idx, n_frame_samples, frame_rms) per window.
    */
  def pcmFrames(pcm: Pcm, nFrames: Int): Seq[(Int, Long, Double)] = {
    val flen = pcm.samples.length / nFrames
    if (flen == 0) return Seq.empty
    (0 until nFrames).map { w =>
      var s = 0L; var i = w * flen
      while (i < (w + 1) * flen) {
        s += pcm.samples(i).toLong * pcm.samples(i); i += 1
      }
      (w, flen.toLong, math.sqrt(s.toDouble / flen))
    }
  }

  // =========================== PPM ===========================
  def ppmWidth(id: Long): Int = 3 + (id % 14).toInt
  def ppmHeight(id: Long): Int = 2 + (id % 9).toInt
  def ppmChannel(id: Long, x: Int, y: Int, c: Int): Int =
    ((id * 5 + y * 17L + x * 7L + c * 29L) % 256).toInt

  /** A valid netpbm P6 payload: ASCII "P6\nW H\n255\n" header, then raw
    * top-down RGB bytes (no padding — that's BMP's trap, not PPM's).
    */
  def encodePpm(id: Long): Array[Byte] = {
    val w = ppmWidth(id); val h = ppmHeight(id)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) { out(i) = ppmChannel(id, x, y, c).toByte; i += 1; c += 1 }
        x += 1
      }
      y += 1
    }
    out
  }

  // =========================== RAW VIDEO ===========================
  // A minimal raw-RGB clip container in the netpbm spirit (the P6
  // pattern extended by a frame count): ASCII "RV1\nW H F\n255\n"
  // header, then F top-down RGB frames back to back. Fixture formulas
  // — mirrored verbatim by the multimodal_video_frames oracle.
  def videoWidth(id: Long): Int = 3 + (id % 10).toInt
  def videoHeight(id: Long): Int = 2 + (id % 7).toInt
  def videoFrames(id: Long): Int = 6 + (id % 11).toInt
  def videoChannel(id: Long, f: Int, x: Int, y: Int, c: Int): Int =
    ((id * 5 + f * 31L + y * 17L + x * 7L + c * 29L) % 256).toInt

  /** A decoded clip: `frame(f)` views one frame as a [[Raster]]. */
  final case class VideoClip(width: Int, height: Int, nFrames: Int,
      px: Array[Int]) {
    def frame(f: Int): Raster = {
      val sz = width * height * 3
      Raster(width, height, java.util.Arrays.copyOfRange(px, f * sz, (f + 1) * sz))
    }
  }

  def encodeVideo(id: Long): Array[Byte] = {
    val w = videoWidth(id); val h = videoHeight(id); val nf = videoFrames(id)
    val header = s"RV1\n$w $h $nf\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + nf * w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var f = 0
    while (f < nf) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            out(i) = videoChannel(id, f, x, y, c).toByte; i += 1; c += 1
          }
          x += 1
        }
        y += 1
      }
      f += 1
    }
    out
  }

  /** Header token scan (the decodePpm discipline), then raw frames. */
  def decodeVideo(b: Array[Byte]): VideoClip = {
    require(b.length >= 3 && b(0) == 'R' && b(1) == 'V' && b(2) == '1',
      "not an RV1 payload")
    var pos = 3
    def nextInt(): Int = {
      while (pos < b.length && Character.isWhitespace(b(pos))) pos += 1
      val st = pos
      while (pos < b.length && !Character.isWhitespace(b(pos))) pos += 1
      require(pos > st, "truncated RV1 header")
      new String(b, st, pos - st, "US-ASCII").toInt
    }
    val w = nextInt(); val h = nextInt(); val nf = nextInt()
    val maxv = nextInt()
    require(maxv == 255, s"unsupported RV1 maxval $maxv")
    pos += 1 // exactly one whitespace byte separates header from frames
    val n = nf * w * h * 3
    require(b.length >= pos + n, "truncated RV1 frames")
    val px = new Array[Int](n)
    var i = 0
    while (i < n) { px(i) = b(pos + i) & 0xff; i += 1 }
    VideoClip(w, h, nf, px)
  }

  /** Whitespace-token scan of the ASCII header, then raw RGB raster. */
  def decodePpm(b: Array[Byte]): Raster = {
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6', "not a P6 PPM payload")
    var pos = 2
    def nextInt(): Int = {
      while (pos < b.length && Character.isWhitespace(b(pos))) pos += 1
      val st = pos
      while (pos < b.length && !Character.isWhitespace(b(pos))) pos += 1
      require(pos > st, "truncated PPM header")
      new String(b, st, pos - st, "US-ASCII").toInt
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    require(maxv == 255, s"unsupported PPM maxval $maxv")
    pos += 1 // exactly one whitespace byte separates header from raster
    require(b.length >= pos + w * h * 3, "truncated PPM raster")
    val px = new Array[Int](w * h * 3)
    var i = 0
    while (i < px.length) { px(i) = b(pos + i) & 0xff; i += 1 }
    Raster(w, h, px)
  }
}
