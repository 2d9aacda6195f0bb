package graft.multimodal

/** Pure-Scala PNG codec — the first REAL compressed format in the
  * multimodal path (zlib lives in the JDK: `java.util.zip.Inflater` /
  * `Deflater`), shrinking the declared codec stub to lossy-only
  * formats (JPEG/MP3/H.264). Reference treats media as opaque bytes
  * behind loaders (fest-vibes-ai-ETL `src/loader/service.py`); here
  * decode is real pixel math end to end.
  *
  * Decode supports the overwhelmingly-common web shape: 8-bit
  * greyscale (color type 0), truecolor RGB (2) and RGBA (6),
  * non-interlaced, all five scanline filters (None/Sub/Up/Average/
  * Paeth), multiple IDAT chunks, CRC-validated. Everything else
  * (palette, 16-bit, Adam7) returns None — the dispatch contract: a
  * payload the codec doesn't speak degrades to the stub featurizer,
  * never fails the task. Alpha is dropped on decode (the featurizers
  * are RGB-space); greyscale replicates into RGB.
  *
  * Scale guards (the 100 TB story — these UDFs run over arbitrary
  * corpus bytes): geometry arithmetic is Long end to end, and the
  * inflate is capped at [[MaxPixelBytes]] expected bytes, so a
  * zip-bomb IDAT costs O(cap) and returns None instead of an OOM.
  */
object PngCodec {

  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** Decompressed-scanline budget: 64 MPix RGBA + filter bytes. */
  val MaxPixelBytes: Long = 1L << 28

  /** Per-dimension bound checked straight off IHDR, before any
    * geometry product — keeps all Long arithmetic overflow-free. */
  val MaxDim: Long = 1L << 24

  /** Cheap signature test (format preservation in resize paths). */
  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= Sig.length &&
      Sig.indices.forall(i => bytes(i) == Sig(i))

  /** Canonical encoding of an RGB image: 8-bit color type 2, scanline
    * `y` filtered with type `y % 5` (deterministic, and every decode
    * of an encoded image exercises all five filter reconstructions),
    * one IDAT, default Deflater. */
  def encode(img: PpmCodec.Image): Array[Byte] =
    encodeRaw(img.width, img.height, colorType = 2, img.rgb)

  /** 8-bit RGBA (color type 6) encoding — `rgba` is w*h*4 bytes. */
  def encodeRgba(width: Int, height: Int, rgba: Array[Byte]): Array[Byte] = {
    require(rgba.length == width * height * 4,
      s"RGBA payload ${rgba.length} != $width*$height*4")
    encodeRaw(width, height, colorType = 6, rgba)
  }

  private def encodeRaw(w: Int, h: Int, colorType: Int,
                        px: Array[Byte]): Array[Byte] = {
    val bpp = if (colorType == 6) 4 else 3
    val rowLen = w * bpp
    val raw = new Array[Byte](h * (1 + rowLen))
    var y = 0
    while (y < h) {
      val filter = y % 5
      raw(y * (1 + rowLen)) = filter.toByte
      var x = 0
      while (x < rowLen) {
        val orig = px(y * rowLen + x) & 0xff
        // predictors read the RAW (unfiltered) neighbors, per spec
        val a = if (x >= bpp) px(y * rowLen + x - bpp) & 0xff else 0
        val b = if (y > 0) px((y - 1) * rowLen + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) px((y - 1) * rowLen + x - bpp) & 0xff
                else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * (1 + rowLen) + 1 + x) = ((orig - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw)
    defl.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) buf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val ihdr = new Array[Byte](13)
    be32(ihdr, 0, w); be32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // compression 0, filter 0, interlace 0 already zero
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", buf.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def be32(a: Array[Byte], p: Int, v: Int): Unit = {
    a(p) = (v >>> 24).toByte; a(p + 1) = (v >>> 16).toByte
    a(p + 2) = (v >>> 8).toByte; a(p + 3) = v.toByte
  }

  private def rd32(a: Array[Byte], p: Int): Long =
    ((a(p) & 0xffL) << 24) | ((a(p + 1) & 0xffL) << 16) |
      ((a(p + 2) & 0xffL) << 8) | (a(p + 3) & 0xffL)

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    be32(len, 0, data.length)
    out.write(len)
    val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(tb)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    val cb = new Array[Byte](4)
    be32(cb, 0, crc.getValue.toInt)
    out.write(cb)
  }

  /** Decode a PNG; None when the bytes are not one this codec speaks
    * (the self-describing dispatch test, like the P6/RIFF/Y4M
    * siblings). Total: corrupt payloads degrade to None, never throw. */
  def decode(bytes: Array[Byte]): Option[PpmCodec.Image] =
    try decodeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte]): Option[PpmCodec.Image] = {
    if (bytes.length < Sig.length + 12) return None
    var i = 0
    while (i < Sig.length) {
      if (bytes(i) != Sig(i)) return None
      i += 1
    }
    var pos = Sig.length
    var w = -1L; var h = -1L; var colorType = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 8 <= bytes.length && !sawIend) {
      val len = rd32(bytes, pos) // Long: a crafted 0xFFFFFFFF stays positive
      val typ = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (pos + 12L + len > bytes.length) return None
      val dataStart = pos + 8
      val dataLen = len.toInt // safe: bounded by bytes.length above
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + dataLen)
      if (crc.getValue != rd32(bytes, dataStart + dataLen)) return None
      typ match {
        case "IHDR" =>
          if (sawIhdr || dataLen != 13) return None
          sawIhdr = true
          w = rd32(bytes, dataStart)
          h = rd32(bytes, dataStart + 4)
          val bitDepth = bytes(dataStart + 8) & 0xff
          colorType = bytes(dataStart + 9) & 0xff
          val compression = bytes(dataStart + 10) & 0xff
          val filterMethod = bytes(dataStart + 11) & 0xff
          val interlace = bytes(dataStart + 12) & 0xff
          if (w <= 0 || h <= 0 || bitDepth != 8 ||
              (colorType != 0 && colorType != 2 && colorType != 6) ||
              compression != 0 || filterMethod != 0 || interlace != 0)
            return None
          // bound each dimension BEFORE any product: rd32 can return up
          // to 2^32-1 and h*(1+w*bpp) on unbounded Longs can wrap
          // negative, sailing past the MaxPixelBytes cap into a ~2 GiB
          // inflateExact allocation (OOM is not NonFatal — it would
          // escape decode()'s catch and kill the task). With both
          // ≤ 2^24 every later product is ≤ ~2^51: overflow-free.
          if (w > MaxDim || h > MaxDim) return None
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(bytes, dataStart, dataLen)
        case "IEND" =>
          sawIend = true
        case _ => () // ancillary chunks (tEXt, gAMA, pHYs…) — skipped
      }
      pos = dataStart + dataLen + 4
    }
    if (!sawIhdr || !sawIend) return None
    val bpp = colorType match {
      case 0 => 1
      case 2 => 3
      case _ => 4
    }
    val expected = h * (1 + w * bpp) // Long geometry throughout
    if (expected > MaxPixelBytes || w * h * 3 > Int.MaxValue) return None
    val raw = inflateExact(idat.toByteArray, expected.toInt)
      .getOrElse(return None)
    val wid = w.toInt; val hei = h.toInt
    val stride = 1 + wid * bpp
    // defilter in place: prior = reconstructed scanline above
    var y = 0
    while (y < hei) {
      val row = y * stride
      val filter = raw(row) & 0xff
      if (filter > 4) return None
      var x = 1
      while (x < stride) {
        val a = if (x > bpp) raw(row + x - bpp) & 0xff else 0 // left
        val b = if (y > 0) raw(row - stride + x) & 0xff else 0 // up
        val c = if (x > bpp && y > 0) raw(row - stride + x - bpp) & 0xff
                else 0 // upper-left
        val add = filter match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => // Paeth predictor
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(row + x) = (((raw(row + x) & 0xff) + add) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // expand to RGB (drop alpha; replicate grey)
    val rgb = new Array[Byte](wid * hei * 3)
    var p = 0
    y = 0
    while (y < hei) {
      val row = y * stride + 1
      var px = 0
      while (px < wid) {
        if (bpp == 1) {
          val g = raw(row + px)
          rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g
        } else {
          val s = row + px * bpp
          rgb(p) = raw(s); rgb(p + 1) = raw(s + 1); rgb(p + 2) = raw(s + 2)
        }
        p += 3
        px += 1
      }
      y += 1
    }
    Some(PpmCodec.Image(wid, hei, rgb))
  }

  /** Inflate to EXACTLY `expected` bytes; None on truncated, oversized
    * (zip bomb — never allocates past `expected`), or corrupt streams. */
  private def inflateExact(z: Array[Byte], expected: Int)
      : Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(z)
    val out = new Array[Byte](expected)
    var off = 0
    try {
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && (inf.finished() || inf.needsDictionary() ||
            inf.needsInput())) return None
        off += n
      }
      // a valid stream must END here: one trailing byte means the
      // payload disagrees with IHDR geometry
      if (off != expected) return None
      if (!inf.finished()) {
        val probe = new Array[Byte](1)
        if (inf.inflate(probe) > 0) return None
      }
      Some(out)
    } finally inf.end()
  }
}
