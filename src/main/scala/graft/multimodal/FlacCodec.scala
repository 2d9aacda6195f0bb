package graft.multimodal

/** Pure-Scala FLAC codec — the LOSSLESS compressed-audio arm, closing
  * the compressed-codec family the way PngCodec closed images: because
  * decode∘encode is the identity on PCM, the exact-round-trip oracle
  * harness works (a lossy codec has no such replayable contract, which
  * is why JPEG/MP3/H.264 stay declared stubs). Reference treats media
  * as opaque bytes behind loaders (fest-vibes-ai-ETL
  * `src/loader/service.py`); here the bitstream math is real end to
  * end: Rice-coded residuals, fixed and LPC predictors, CRC-8-guarded
  * frame headers and CRC-16-guarded frames.
  *
  * Encode (16-bit PCM, mono or stereo): fixed 4096-sample blocks; each
  * (frame, channel) walks a deterministic subframe schedule — fixed
  * predictor orders 0-4, VERBATIM, and an order-2 LPC — so one clip
  * exercises every decode path (the PngCodec `y % 5` idea applied to
  * subframe types); stereo frames cycle the four channel assignments
  * (independent, left/side, right/side, mid/side); odd frames use Rice
  * partition order 2. Decode accepts the general 16-bit subset:
  * CONSTANT/VERBATIM/FIXED/LPC subframes, wasted bits, escaped Rice
  * partitions, any partition order, both 4- and 5-bit Rice parameter
  * widths, all four channel assignments.
  *
  * Scale guards (the UDFs run over arbitrary corpus bytes): sample
  * counts are capped at [[MaxSamples]] before any allocation, Rice
  * unary runs are bounded, and every malformed/truncated/CRC-broken
  * payload returns None — never a throw, never an OOM.
  */
object FlacCodec {

  /** Cheap signature test (container dispatch). */
  def isFlac(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'

  /** Decoded-sample budget: 2^26 total samples (~128 MiB of PCM16). */
  val MaxSamples: Long = 1L << 26

  private val BlockSize = 4096

  // ---- CRCs (FLAC: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0,
  // both unreflected) ----
  private val Crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; k += 1 }
    c & 0xff
  }
  private val Crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8
    var k = 0
    while (k < 8) {
      c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1
      k += 1
    }
    c & 0xffff
  }
  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = Crc8Table(c ^ (bytes(i) & 0xff)); i += 1 }
    c
  }
  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) {
      c = ((c << 8) ^ Crc16Table(((c >> 8) ^ (bytes(i) & 0xff)) & 0xff)) & 0xffff
      i += 1
    }
    c
  }

  // ---- bit IO ----
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nbits = 0
    def writeBit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); nbits += 1
      if (nbits == 8) { buf.write(acc & 0xff); acc = 0; nbits = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    /** q zero bits then a terminating one (FLAC Rice quotient form). */
    def writeUnary(q: Long): Unit = {
      var i = 0L
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def alignByte(): Unit = while (nbits != 0) writeBit(0)
    def toBytes: Array[Byte] = { alignByte(); buf.toByteArray }
  }

  private final class BitReader(val bytes: Array[Byte], var pos: Int) {
    var bit: Int = 0
    def readBit(): Int = {
      if (pos >= bytes.length) throw new java.io.EOFException("flac bits")
      val b = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** zeros before the terminating one; bounded (bomb guard). */
    def readUnary(): Long = {
      var q = 0L
      while (readBit() == 0) {
        q += 1
        if (q > (1L << 24)) throw new java.io.EOFException("unary bomb")
      }
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ---- UTF-8-style coded number (frame header; up to 36 bits) ----
  private def writeUtf8Number(out: java.io.ByteArrayOutputStream,
                              v: Long): Unit = {
    if (v < 0x80) out.write(v.toInt)
    else {
      // n continuation bytes, n in 1..6
      var n = 1
      while (n < 6 && v >= (1L << (6 - n + 6 * n))) n += 1
      val lead = (0xFF << (7 - n)) & 0xFF
      out.write(lead | (v >>> (6 * n)).toInt)
      var i = n - 1
      while (i >= 0) {
        out.write(0x80 | ((v >>> (6 * i)) & 0x3F).toInt)
        i -= 1
      }
    }
  }
  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var n = 0
      var mask = 0x40
      while (n < 7 && (b0 & mask) != 0) { n += 1; mask >>= 1 }
      if (n == 0 || n > 6) throw new java.io.EOFException("bad utf8 number")
      var v = (b0 & (mask - 1)).toLong
      var i = 0
      while (i < n) {
        val c = r.readBits(8).toInt
        if ((c & 0xC0) != 0x80) throw new java.io.EOFException("bad utf8 cont")
        v = (v << 6) | (c & 0x3F)
        i += 1
      }
      v
    }
  }

  // ---- fixed predictor residual/reconstruction coefficients ----
  private def fixedResidual(x: Array[Long], i: Int, order: Int): Long =
    order match {
      case 0 => x(i)
      case 1 => x(i) - x(i - 1)
      case 2 => x(i) - 2 * x(i - 1) + x(i - 2)
      case 3 => x(i) - 3 * x(i - 1) + 3 * x(i - 2) - x(i - 3)
      case _ => x(i) - 4 * x(i - 1) + 6 * x(i - 2) - 4 * x(i - 3) + x(i - 4)
    }
  private def fixedPredict(x: Array[Long], i: Int, order: Int): Long =
    order match {
      case 0 => 0L
      case 1 => x(i - 1)
      case 2 => 2 * x(i - 1) - x(i - 2)
      case 3 => 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
      case _ => 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
    }

  private def zigzag(r: Long): Long = if (r < 0) -2 * r - 1 else 2 * r
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  /** Optimal Rice parameter for one partition (minimizes total bits). */
  private def bestRiceParam(res: Array[Long], from: Int, until: Int): Int = {
    var bestK = 0; var bestCost = Long.MaxValue
    var k = 0
    while (k <= 30) {
      var cost = 0L; var i = from
      while (i < until) { cost += (zigzag(res(i)) >>> k) + k + 1; i += 1 }
      if (cost < bestCost) { bestCost = cost; bestK = k }
      k += 1
    }
    bestK
  }

  /** Encode one channel's subframe into `w`. `sel` picks the type:
    * 0-4 fixed order, 5 VERBATIM, 6 LPC order 2 (coeffs [2,-1], shift 0
    * — numerically the fixed-2 predictor through the LPC decode path).
    * Constant channels short-circuit to CONSTANT. */
  private def encodeSubframe(w: BitWriter, x: Array[Long], bps: Int,
                             sel: Int, partOrder: Int): Unit = {
    val n = x.length
    var const = true
    var i = 1
    while (i < n && const) { if (x(i) != x(0)) const = false; i += 1 }
    w.writeBit(0) // zero padding
    if (const) {
      w.writeBits(0L, 6) // CONSTANT
      w.writeBit(0) // no wasted bits
      w.writeBits(x(0) & ((1L << bps) - 1), bps)
      return
    }
    val useSel = if (sel <= 4 && n <= sel) 5 else sel // too short for order
    useSel match {
      case 5 => // VERBATIM
        w.writeBits(1L, 6)
        w.writeBit(0)
        var j = 0
        while (j < n) { w.writeBits(x(j) & ((1L << bps) - 1), bps); j += 1 }
      case 6 => // LPC order 2
        if (n <= 2) { // degrade: VERBATIM
          w.writeBits(1L, 6); w.writeBit(0)
          var j = 0
          while (j < n) { w.writeBits(x(j) & ((1L << bps) - 1), bps); j += 1 }
          return
        }
        w.writeBits(0x20L | (2 - 1), 6) // 1xxxxx, order-1
        w.writeBit(0)
        w.writeBits(x(0) & ((1L << bps) - 1), bps)
        w.writeBits(x(1) & ((1L << bps) - 1), bps)
        w.writeBits(4L - 1, 4) // precision 4 bits (stored as prec-1)
        w.writeBits(0L, 5) // shift 0
        w.writeBits(2L & 0xF, 4) // coeff 2
        w.writeBits(-1L & 0xF, 4) // coeff -1
        val res = new Array[Long](n)
        var j = 2
        while (j < n) { res(j) = x(j) - (2 * x(j - 1) - x(j - 2)); j += 1 }
        writeResidual(w, res, n, order = 2, partOrder)
      case o => // FIXED order o
        w.writeBits(0x08L | o, 6)
        w.writeBit(0)
        var j = 0
        while (j < o) { w.writeBits(x(j) & ((1L << bps) - 1), bps); j += 1 }
        val res = new Array[Long](n)
        j = o
        while (j < n) { res(j) = fixedResidual(x, j, o); j += 1 }
        writeResidual(w, res, n, order = o, partOrder)
    }
  }

  /** Residual coding method 1 (5-bit Rice params), optimal param per
    * partition. `res` is full-length; entries < order are warmup. */
  private def writeResidual(w: BitWriter, res: Array[Long], n: Int,
                            order: Int, partOrderWanted: Int): Unit = {
    val partOrder =
      if (partOrderWanted > 0 && n % (1 << partOrderWanted) == 0 &&
          (n >> partOrderWanted) > order) partOrderWanted
      else 0
    w.writeBits(1L, 2) // method: 5-bit params
    w.writeBits(partOrder.toLong, 4)
    val nParts = 1 << partOrder
    var p = 0
    while (p < nParts) {
      val from = if (p == 0) order else p * (n >> partOrder)
      val until = (p + 1) * (n >> partOrder)
      val k = bestRiceParam(res, from, until)
      w.writeBits(k.toLong, 5)
      var i = from
      while (i < until) {
        val u = zigzag(res(i))
        w.writeUnary(u >>> k)
        if (k > 0) w.writeBits(u & ((1L << k) - 1), k)
        i += 1
      }
      p += 1
    }
  }

  /** Encode 16-bit PCM (mono or stereo). Deterministic schedules:
    * subframe type `(frame*2 + ch) % 7`, stereo channel assignment
    * `frame % 4`, Rice partition order 2 on odd frames. */
  def encode(clip: WavCodec.Clip): Array[Byte] = {
    require(clip.channels == 1 || clip.channels == 2,
      s"FLAC encoder: 1-2 channels, got ${clip.channels}")
    val nFrames0 = clip.frames
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('f', 'L', 'a', 'C'), 0, 4)
    // STREAMINFO (last metadata block): header + 34-byte body
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val si = new BitWriter
    si.writeBits(BlockSize.toLong, 16)
    si.writeBits(BlockSize.toLong, 16)
    si.writeBits(0L, 24); si.writeBits(0L, 24) // frame sizes unknown
    si.writeBits(clip.sampleRate.toLong, 20)
    si.writeBits((clip.channels - 1).toLong, 3)
    si.writeBits(15L, 5) // bps-1
    si.writeBits(nFrames0.toLong, 36)
    val siBytes = si.toBytes
    out.write(siBytes, 0, siBytes.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    val pcm = new Array[Byte](clip.samples.length * 2)
    var i = 0
    while (i < clip.samples.length) {
      pcm(i * 2) = clip.samples(i).toByte
      pcm(i * 2 + 1) = (clip.samples(i) >> 8).toByte
      i += 1
    }
    out.write(md.digest(pcm), 0, 16)

    var frameNo = 0L
    var start = 0
    while (start < nFrames0 || (nFrames0 == 0 && frameNo == 0)) {
      val n = math.min(BlockSize, nFrames0 - start)
      if (n <= 0) return out.toByteArray
      val hdr = new java.io.ByteArrayOutputStream()
      hdr.write(0xFF); hdr.write(0xF8) // sync 11111111 111110, rsv 0, fixed
      val bsCode = if (n == BlockSize) 0xC else 0x7
      hdr.write((bsCode << 4) | 0x0) // sample rate from STREAMINFO
      val chanAsgn =
        if (clip.channels == 1) 0
        else (frameNo % 4) match {
          case 0 => 1 // independent stereo
          case 1 => 8 // left/side
          case 2 => 9 // right/side
          case _ => 10 // mid/side
        }
      hdr.write((chanAsgn << 4) | (4 << 1)) // bps code 100 = 16, rsv 0
      writeUtf8Number(hdr, frameNo)
      if (bsCode == 0x7) { hdr.write((n - 1) >> 8); hdr.write((n - 1) & 0xff) }
      val hb = hdr.toByteArray
      hdr.write(crc8(hb, 0, hb.length))
      val headerBytes = hdr.toByteArray

      // channel sample arrays (possibly decorrelated)
      val chans: Array[Array[Long]] =
        if (clip.channels == 1) {
          val a = new Array[Long](n)
          var j = 0
          while (j < n) { a(j) = clip.samples(start + j).toLong; j += 1 }
          Array(a)
        } else {
          val l = new Array[Long](n); val r = new Array[Long](n)
          var j = 0
          while (j < n) {
            l(j) = clip.samples((start + j) * 2).toLong
            r(j) = clip.samples((start + j) * 2 + 1).toLong
            j += 1
          }
          chanAsgn match {
            case 1 => Array(l, r)
            case 8 => Array(l, Array.tabulate(n)(j => l(j) - r(j)))
            case 9 => Array(Array.tabulate(n)(j => l(j) - r(j)), r)
            case _ => Array(Array.tabulate(n)(j => (l(j) + r(j)) >> 1),
              Array.tabulate(n)(j => l(j) - r(j)))
          }
        }
      val w = new BitWriter
      val partOrder = if (frameNo % 2 == 1) 2 else 0
      var ch = 0
      while (ch < chans.length) {
        val bps = 16 + (chanAsgn match {
          case 8 => if (ch == 1) 1 else 0
          case 9 => if (ch == 0) 1 else 0
          case 10 => if (ch == 1) 1 else 0
          case _ => 0
        })
        encodeSubframe(w, chans(ch), bps,
          sel = ((frameNo * 2 + ch) % 7).toInt, partOrder)
        ch += 1
      }
      val body = w.toBytes
      val whole = new Array[Byte](headerBytes.length + body.length)
      System.arraycopy(headerBytes, 0, whole, 0, headerBytes.length)
      System.arraycopy(body, 0, whole, headerBytes.length, body.length)
      val c16 = crc16(whole, 0, whole.length)
      out.write(whole, 0, whole.length)
      out.write(c16 >> 8); out.write(c16 & 0xff)
      start += n
      frameNo += 1
    }
    out.toByteArray
  }

  /** Decode a FLAC payload; None when the bytes are not well-formed
    * 16-bit 1-2-channel FLAC this codec speaks. Total: corrupt payloads
    * degrade to None, never throw. */
  def decode(bytes: Array[Byte]): Option[WavCodec.Clip] =
    try decodeImpl(bytes)
    catch {
      case _: java.io.EOFException => None
      case scala.util.control.NonFatal(_) => None
    }

  private def decodeImpl(bytes: Array[Byte]): Option[WavCodec.Clip] = {
    if (!isFlac(bytes)) return None
    var pos = 4
    var rate = -1; var channels = -1; var bps = -1; var total = -1L
    var sawStreamInfo = false
    var last = false
    while (!last) {
      if (pos + 4 > bytes.length) return None
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      if (pos + 4L + len > bytes.length) return None
      if (typ == 0) {
        if (sawStreamInfo || len != 34) return None
        sawStreamInfo = true
        val r = new BitReader(bytes, pos + 4)
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        rate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        total = r.readBits(36)
      }
      pos += 4 + len
    }
    if (!sawStreamInfo || rate <= 0 || bps != 16) return None
    if (channels < 1 || channels > 2) return None
    if (total < 0 || total > MaxSamples) return None
    val out = new Array[Short](total.toInt * channels)
    var collected = 0L
    while (collected < total) {
      val r = new BitReader(bytes, pos)
      val frameStart = pos
      if (r.readBits(14) != 0x3FFE) return None
      r.readBits(1) // reserved
      r.readBits(1) // blocking strategy
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chanAsgn = r.readBits(4).toInt
      val bpsCode = r.readBits(3).toInt
      if (r.readBits(1) != 0L) return None
      readUtf8Number(r)
      val blockSize = bsCode match {
        case 0 => return None // reserved
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match { // value comes from STREAMINFO; frame field validated
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => return None
        case _ => ()
      }
      val frameBps = bpsCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case _ => return None
      }
      if (frameBps != 16) return None
      val nCh = if (chanAsgn < 8) chanAsgn + 1
                else if (chanAsgn <= 10) 2
                else return None
      if (nCh != channels) return None
      // CRC-8 covers the header up to here (reader is byte-aligned:
      // 32 fixed bits + whole-byte number/blocksize/rate fields)
      if (r.bit != 0) return None
      if (crc8(bytes, frameStart, r.pos) != r.readBits(8).toInt) return None
      if (blockSize.toLong > total - collected) return None

      val chans = new Array[Array[Long]](nCh)
      var ch = 0
      while (ch < nCh) {
        val chBps = 16 + (chanAsgn match {
          case 8 => if (ch == 1) 1 else 0
          case 9 => if (ch == 0) 1 else 0
          case 10 => if (ch == 1) 1 else 0
          case _ => 0
        })
        chans(ch) = readSubframe(r, blockSize, chBps).getOrElse(return None)
        ch += 1
      }
      r.alignByte()
      if (crc16(bytes, frameStart, r.pos) != r.readBits(16).toInt)
        return None
      // undo inter-channel decorrelation
      val (l, rr): (Array[Long], Array[Long]) = chanAsgn match {
        case 8 => (chans(0), Array.tabulate(blockSize)(j =>
          chans(0)(j) - chans(1)(j)))
        case 9 => (Array.tabulate(blockSize)(j => chans(0)(j) + chans(1)(j)),
          chans(1))
        case 10 => (null, null) // handled below (needs both at once)
        case _ => (chans(0), if (nCh == 2) chans(1) else null)
      }
      var j = 0
      while (j < blockSize) {
        if (channels == 1) {
          out((collected + j).toInt) = chans(0)(j).toShort
        } else if (chanAsgn == 10) {
          val side = chans(1)(j)
          val mid2 = (chans(0)(j) << 1) | (side & 1L)
          out(((collected + j) * 2).toInt) = ((mid2 + side) >> 1).toShort
          out(((collected + j) * 2 + 1).toInt) = ((mid2 - side) >> 1).toShort
        } else {
          out(((collected + j) * 2).toInt) = l(j).toShort
          out(((collected + j) * 2 + 1).toInt) = rr(j).toShort
        }
        j += 1
      }
      collected += blockSize
      pos = r.pos
    }
    Some(WavCodec.Clip(rate, channels, out))
  }

  /** One subframe: type dispatch, wasted bits, prediction replay. */
  private def readSubframe(r: BitReader, n: Int,
                           bps0: Int): Option[Array[Long]] = {
    if (r.readBits(1) != 0L) return None // padding bit
    val typ = r.readBits(6).toInt
    val wasted = if (r.readBits(1) == 1L) r.readUnary().toInt + 1 else 0
    val bps = bps0 - wasted
    if (bps <= 0) return None
    val x = new Array[Long](n)
    if (typ == 0) { // CONSTANT
      val v = r.readSigned(bps)
      java.util.Arrays.fill(x, v)
    } else if (typ == 1) { // VERBATIM
      var j = 0
      while (j < n) { x(j) = r.readSigned(bps); j += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
      val order = typ & 0x07
      if (order > n) return None
      var j = 0
      while (j < order) { x(j) = r.readSigned(bps); j += 1 }
      val res = readResidual(r, n, order).getOrElse(return None)
      j = order
      while (j < n) { x(j) = res(j) + fixedPredict(x, j, order); j += 1 }
    } else if ((typ & 0x20) != 0) { // LPC
      val order = (typ & 0x1F) + 1
      if (order > n) return None
      var j = 0
      while (j < order) { x(j) = r.readSigned(bps); j += 1 }
      val precM1 = r.readBits(4).toInt
      if (precM1 == 15) return None
      val prec = precM1 + 1
      val shift = r.readSigned(5).toInt
      if (shift < 0) return None
      val coefs = new Array[Long](order)
      j = 0
      while (j < order) { coefs(j) = r.readSigned(prec); j += 1 }
      val res = readResidual(r, n, order).getOrElse(return None)
      j = order
      while (j < n) {
        var acc = 0L; var t = 0
        while (t < order) { acc += coefs(t) * x(j - 1 - t); t += 1 }
        x(j) = res(j) + (acc >> shift)
        j += 1
      }
    } else return None
    if (wasted > 0) {
      var j = 0
      while (j < n) { x(j) = x(j) << wasted; j += 1 }
    }
    Some(x)
  }

  /** Partitioned Rice residual; supports both parameter widths and the
    * escape (raw verbatim) partition form. */
  private def readResidual(r: BitReader, n: Int,
                           order: Int): Option[Array[Long]] = {
    val method = r.readBits(2).toInt
    if (method > 1) return None
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val partOrder = r.readBits(4).toInt
    val nParts = 1 << partOrder
    if (n % nParts != 0) return None
    val partLen = n >> partOrder
    if (partLen <= order && nParts == 1) return None
    if (partLen < order && nParts > 1) return None
    val res = new Array[Long](n)
    var p = 0
    while (p < nParts) {
      val from = if (p == 0) order else p * partLen
      val until = (p + 1) * partLen
      if (from > until) return None
      val k = r.readBits(paramBits).toInt
      if (k == escape) {
        val raw = r.readBits(5).toInt
        var i = from
        while (i < until) {
          res(i) = if (raw == 0) 0L else r.readSigned(raw)
          i += 1
        }
      } else {
        var i = from
        while (i < until) {
          val q = r.readUnary()
          val u = (q << k) | (if (k > 0) r.readBits(k) else 0L)
          res(i) = unzigzag(u)
          i += 1
        }
      }
      p += 1
    }
    Some(res)
  }
}
