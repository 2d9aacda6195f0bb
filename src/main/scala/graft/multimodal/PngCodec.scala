package graft.multimodal

/** Pure-Scala PNG codec — the first REAL compressed format in the
  * multimodal path (zlib lives in the JDK: `java.util.zip.Inflater` /
  * `Deflater`), shrinking the declared codec stub to lossy-only
  * formats (JPEG/MP3/H.264). Reference treats media as opaque bytes
  * behind loaders (fest-vibes-ai-ETL `src/loader/service.py`); here
  * decode is real pixel math end to end.
  *
  * Decode supports every legal (color type, bit depth) combination:
  * greyscale (0) at 1/2/4/8/16 bits, truecolor RGB (2) and RGBA (6)
  * at 8/16, palette (3) at 1/2/4/8 via PLTE, grey+alpha (4) at 8/16 —
  * each both straight and Adam7-interlaced — with all five scanline
  * filters (None/Sub/Up/Average/Paeth), multiple IDAT chunks,
  * CRC-validated. A malformed payload returns None — the dispatch
  * contract: a payload the codec can't prove well-formed degrades to
  * the stub featurizer, never fails the task. Output is always 8-bit
  * RGB: alpha is dropped (the featurizers are RGB-space), greyscale
  * replicates into RGB (sub-byte samples scale to 0-255), and 16-bit
  * samples keep their high byte.
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
    writePng(img.width, img.height, bitDepth = 8, colorType = 2,
      interlace = 0, plte = None,
      filterRows(img.rgb, img.height, img.width * 3, 3))

  /** 8-bit RGBA (color type 6) encoding — `rgba` is w*h*4 bytes. */
  def encodeRgba(width: Int, height: Int, rgba: Array[Byte]): Array[Byte] = {
    require(rgba.length == width * height * 4,
      s"RGBA payload ${rgba.length} != $width*$height*4")
    writePng(width, height, bitDepth = 8, colorType = 6, interlace = 0,
      plte = None, filterRows(rgba, height, width * 4, 4))
  }

  /** Paletted (color type 3, 8-bit indices) encoding: `indices` is
    * w*h bytes into `palette` (3 bytes per entry, ≤ 256 entries). */
  def encodePalette(width: Int, height: Int, indices: Array[Byte],
                    palette: Array[Byte]): Array[Byte] = {
    require(indices.length == width * height,
      s"index payload ${indices.length} != $width*$height")
    require(palette.length % 3 == 0 && palette.length <= 768,
      s"palette must be 3 bytes per entry, <= 256 entries")
    writePng(width, height, bitDepth = 8, colorType = 3, interlace = 0,
      plte = Some(palette), filterRows(indices, height, width, 1))
  }

  /** 16-bit RGB (color type 2, depth 16) encoding: `samples` is w*h*3
    * 16-bit values in row-major RGB order, stored big-endian. */
  def encode16(width: Int, height: Int, samples: Array[Int]): Array[Byte] = {
    require(samples.length == width * height * 3,
      s"sample payload ${samples.length} != $width*$height*3")
    val content = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      content(i * 2) = (samples(i) >>> 8).toByte
      content(i * 2 + 1) = samples(i).toByte
      i += 1
    }
    writePng(width, height, bitDepth = 16, colorType = 2, interlace = 0,
      plte = None, filterRows(content, height, width * 6, 6))
  }

  /** Adam7-interlaced 8-bit RGB encoding: identical pixels to
    * [[encode]], stored as the 7 interlace passes (each pass filtered
    * independently with the y%5 schedule, per spec). */
  def encodeAdam7(img: PpmCodec.Image): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Adam7.foreach { case (x0, y0, dx, dy) =>
      val wp = if (img.width > x0) (img.width - x0 + dx - 1) / dx else 0
      val hp = if (img.height > y0) (img.height - y0 + dy - 1) / dy else 0
      if (wp > 0 && hp > 0) {
        val content = new Array[Byte](wp * hp * 3)
        var y = 0
        while (y < hp) {
          var x = 0
          while (x < wp) {
            val src = ((y0 + y * dy) * img.width + (x0 + x * dx)) * 3
            val dst = (y * wp + x) * 3
            content(dst) = img.rgb(src)
            content(dst + 1) = img.rgb(src + 1)
            content(dst + 2) = img.rgb(src + 2)
            x += 1
          }
          y += 1
        }
        out.write(filterRows(content, hp, wp * 3, 3))
      }
    }
    writePng(img.width, img.height, bitDepth = 8, colorType = 2,
      interlace = 1, plte = None, out.toByteArray)
  }

  /** The Adam7 pass grid: (x0, y0, dx, dy) per pass. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Filter `nRows` scanlines of `rowLen` raw bytes with the `y % 5`
    * schedule; predictors read the RAW (unfiltered) neighbors, per
    * spec. `bpp` is the filter unit (whole bytes per pixel, min 1). */
  private def filterRows(content: Array[Byte], nRows: Int, rowLen: Int,
                         bpp: Int): Array[Byte] = {
    val out = new Array[Byte](nRows * (1 + rowLen))
    var y = 0
    while (y < nRows) {
      val filter = y % 5
      out(y * (1 + rowLen)) = filter.toByte
      var x = 0
      while (x < rowLen) {
        val orig = content(y * rowLen + x) & 0xff
        val a = if (x >= bpp) content(y * rowLen + x - bpp) & 0xff else 0
        val b = if (y > 0) content((y - 1) * rowLen + x) & 0xff else 0
        val c = if (x >= bpp && y > 0)
          content((y - 1) * rowLen + x - bpp) & 0xff else 0
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
        out(y * (1 + rowLen) + 1 + x) = ((orig - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  private def writePng(w: Int, h: Int, bitDepth: Int, colorType: Int,
                       interlace: Int, plte: Option[Array[Byte]],
                       raw: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw)
    defl.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) buf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val ihdr = new Array[Byte](13)
    be32(ihdr, 0, w); be32(ihdr, 4, h)
    ihdr(8) = bitDepth.toByte
    ihdr(9) = colorType.toByte
    ihdr(12) = interlace.toByte
    // compression 0, filter 0 already zero
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    writeChunk(out, "IHDR", ihdr)
    plte.foreach(p => writeChunk(out, "PLTE", p))
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

  /** Legal (colorType, bitDepth) combinations, per the PNG spec. */
  private def validCombo(ct: Int, depth: Int): Boolean = ct match {
    case 0 => depth == 1 || depth == 2 || depth == 4 || depth == 8 ||
      depth == 16
    case 2 | 4 | 6 => depth == 8 || depth == 16
    case 3 => depth == 1 || depth == 2 || depth == 4 || depth == 8
    case _ => false
  }

  private def decodeImpl(bytes: Array[Byte]): Option[PpmCodec.Image] = {
    if (bytes.length < Sig.length + 12) return None
    var i = 0
    while (i < Sig.length) {
      if (bytes(i) != Sig(i)) return None
      i += 1
    }
    var pos = Sig.length
    var w = -1L; var h = -1L; var colorType = -1
    var bitDepth = -1; var interlace = -1
    var palette: Array[Byte] = null
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
          bitDepth = bytes(dataStart + 8) & 0xff
          colorType = bytes(dataStart + 9) & 0xff
          val compression = bytes(dataStart + 10) & 0xff
          val filterMethod = bytes(dataStart + 11) & 0xff
          interlace = bytes(dataStart + 12) & 0xff
          if (w <= 0 || h <= 0 || !validCombo(colorType, bitDepth) ||
              compression != 0 || filterMethod != 0 ||
              (interlace != 0 && interlace != 1))
            return None
          // bound each dimension BEFORE any product: rd32 can return up
          // to 2^32-1 and the raw-length Long products can wrap
          // negative, sailing past the MaxPixelBytes cap into a ~2 GiB
          // inflateExact allocation (OOM is not NonFatal — it would
          // escape decode()'s catch and kill the task). With both
          // ≤ 2^24 every later product is ≤ ~2^51: overflow-free.
          if (w > MaxDim || h > MaxDim) return None
        case "PLTE" =>
          if (!sawIhdr || palette != null || dataLen % 3 != 0 ||
              dataLen == 0 || dataLen > 768) return None
          palette = java.util.Arrays.copyOfRange(bytes, dataStart,
            dataStart + dataLen)
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
    if (colorType == 3 && palette == null) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case _ => 4
    }
    val bitsPerPx = bitDepth * channels
    val fbpp = math.max(1, bitsPerPx / 8) // filter unit, whole bytes
    def rowBytesOf(wp: Long): Long = (wp * bitsPerPx + 7) / 8
    // interlace passes: (x0, y0, dx, dy, wp, hp); nonempty only
    val passes: Seq[(Int, Int, Int, Int, Int, Int)] =
      if (interlace == 0) Seq((0, 0, 1, 1, w.toInt, h.toInt))
      else Adam7.toSeq.flatMap { case (x0, y0, dx, dy) =>
        val wp = if (w > x0) ((w - x0 + dx - 1) / dx).toInt else 0
        val hp = if (h > y0) ((h - y0 + dy - 1) / dy).toInt else 0
        if (wp > 0 && hp > 0) Some((x0, y0, dx, dy, wp, hp)) else None
      }
    val expected = passes // Long geometry throughout
      .map(p => p._6.toLong * (1 + rowBytesOf(p._5.toLong))).sum
    if (expected > MaxPixelBytes || w * h * 3 > Int.MaxValue) return None
    val raw = inflateExact(idat.toByteArray, expected.toInt)
      .getOrElse(return None)
    val wid = w.toInt; val hei = h.toInt
    val rgb = new Array[Byte](wid * hei * 3)
    val maxSub = (1 << bitDepth) - 1 // sub-byte grey scale divisor
    var off = 0
    passes.foreach { case (x0, y0, dx, dy, wp, hp) =>
      val rb = rowBytesOf(wp.toLong).toInt
      val stride = 1 + rb
      var y = 0
      while (y < hp) {
        val row = off + y * stride
        val filter = raw(row) & 0xff
        if (filter > 4) return None
        // defilter in place: prior = reconstructed scanline above
        // (within THIS pass — each pass filters independently)
        var x = 1
        while (x <= rb) {
          val a = if (x > fbpp) raw(row + x - fbpp) & 0xff else 0 // left
          val b = if (y > 0) raw(row - stride + x) & 0xff else 0 // up
          val c = if (x > fbpp && y > 0) raw(row - stride + x - fbpp) & 0xff
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
        // scatter this scanline's pixels into the output grid
        val base = row + 1
        var px = 0
        while (px < wp) {
          var r = 0; var g = 0; var bl = 0
          colorType match {
            case 2 => // truecolor RGB, depth 8 or 16 (keep the high byte)
              val s = if (bitDepth == 16) base + px * 6 else base + px * 3
              val step = if (bitDepth == 16) 2 else 1
              r = raw(s) & 0xff; g = raw(s + step) & 0xff
              bl = raw(s + 2 * step) & 0xff
            case 6 => // RGBA: alpha dropped
              val s = if (bitDepth == 16) base + px * 8 else base + px * 4
              val step = if (bitDepth == 16) 2 else 1
              r = raw(s) & 0xff; g = raw(s + step) & 0xff
              bl = raw(s + 2 * step) & 0xff
            case 4 => // grey + alpha: alpha dropped, grey replicated
              val s = if (bitDepth == 16) base + px * 4 else base + px * 2
              r = raw(s) & 0xff; g = r; bl = r
            case 0 => // greyscale, all depths; sub-byte scales to 0-255
              if (bitDepth == 16) { r = raw(base + px * 2) & 0xff }
              else if (bitDepth == 8) { r = raw(base + px) & 0xff }
              else {
                val bitOff = px * bitDepth
                val shift = 8 - bitDepth - (bitOff % 8)
                val v = (raw(base + bitOff / 8) >> shift) & maxSub
                r = v * 255 / maxSub
              }
              g = r; bl = r
            case _ => // palette indices, depths 1/2/4/8
              val idxv =
                if (bitDepth == 8) raw(base + px) & 0xff
                else {
                  val bitOff = px * bitDepth
                  val shift = 8 - bitDepth - (bitOff % 8)
                  (raw(base + bitOff / 8) >> shift) & maxSub
                }
              if (idxv * 3 + 2 >= palette.length) return None // bad index
              r = palette(idxv * 3) & 0xff
              g = palette(idxv * 3 + 1) & 0xff
              bl = palette(idxv * 3 + 2) & 0xff
          }
          val dest = ((y0 + y * dy) * wid + (x0 + px * dx)) * 3
          rgb(dest) = r.toByte; rgb(dest + 1) = g.toByte
          rgb(dest + 2) = bl.toByte
          px += 1
        }
        y += 1
      }
      off += hp * stride
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
