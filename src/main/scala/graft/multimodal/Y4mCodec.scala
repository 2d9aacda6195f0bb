package graft.multimodal

/** Pure-Scala codec for YUV4MPEG2 (Y4M) — the uncompressed video
  * interchange format (the bytes `ffmpeg -f yuv4mpegpipe` emits): an
  * ASCII header `YUV4MPEG2 W<w> H<h> F<num>:<den> ...\n`, then per
  * frame `FRAME\n` followed by the raw C420 planes (Y w×h, then U and V
  * at w/2×h/2). No video library exists in this environment and none is
  * needed for raw planes, so with [[PpmCodec]] (images) and
  * [[WavCodec]] (audio) this closes the LAST multimodal decode stub:
  * frame counting, per-frame luma statistics, and frame-to-frame motion
  * are REAL pixel math end to end.
  *
  * The parser accepts any order of header parameters and skips unknown
  * ones (X metadata, interlacing, aspect), requiring W/H/F and — when a
  * colorspace is present — C420 variants. Frame headers may carry
  * parameters too (`FRAME Xfoo\n`); they are skipped. The writer emits
  * the canonical `YUV4MPEG2 W H F Ip A1:1 C420` single-space form,
  * which is what the SQL oracle's byte-length arithmetic assumes.
  */
object Y4mCodec {

  /** Decoded clip: per-frame C420 planes (`w*h` luma bytes followed by
    * two `w/2 × h/2` chroma planes — `w` and `h` must be even). */
  final case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                         frames: Vector[Array[Byte]]) {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"C420 needs positive even dimensions, got ${width}x$height")
    require(fpsNum > 0 && fpsDen > 0, s"bad frame rate $fpsNum:$fpsDen")
    require(width.toLong * height * 3 / 2 <= Int.MaxValue,
      s"frame too large for a byte array: ${width}x$height")
    val frameBytes: Int = width * height * 3 / 2
    require(frames.forall(_.length == frameBytes),
      s"every frame must be $frameBytes bytes")
    /** Luma plane (first w*h bytes) of frame `f`. */
    def luma(f: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(frames(f), 0, width * height)
  }

  /** Exact per-clip statistics (the video-curation gate's inputs): all
    * integer sums; the means divide once at the end (IEEE, portable). */
  final case class Stats(width: Int, height: Int, nFrames: Int,
                         durationMs: Long, lumaSum: Long, motionSum: Long) {
    def lumaMean: Double =
      if (nFrames == 0) 0.0
      else lumaSum.toDouble / (nFrames.toLong * width * height)
    /** Mean |ΔY| between consecutive frames — the scene-change /
      * static-clip detector. */
    def motionMean: Double =
      if (nFrames < 2) 0.0
      else motionSum.toDouble / ((nFrames - 1).toLong * width * height)
  }

  private val Magic = "YUV4MPEG2"

  /** Canonical single-space header encoding. */
  def encode(v: Video): Array[Byte] = {
    val header =
      s"$Magic W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A1:1 C420\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val frameHdr = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length +
      v.frames.size * (frameHdr.length + v.frameBytes))
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    v.frames.foreach { f =>
      System.arraycopy(frameHdr, 0, out, pos, frameHdr.length)
      pos += frameHdr.length
      System.arraycopy(f, 0, out, pos, f.length)
      pos += f.length
    }
    out
  }

  /** Decode a C420 Y4M; None when the bytes are not one (the
    * self-describing dispatch test, like the P6/RIFF siblings). Total:
    * corrupt payloads degrade to None (→ stub path), never throw. */
  def decode(bytes: Array[Byte]): Option[Video] =
    try decodeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte]): Option[Video] = {
    val magic = Magic.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < magic.length + 1) return None
    var i = 0
    while (i < magic.length) {
      if (bytes(i) != magic(i)) return None
      i += 1
    }
    // stream header: space-separated parameters through the first \n
    var eol = magic.length
    while (eol < bytes.length && bytes(eol) != '\n') eol += 1
    if (eol >= bytes.length) return None
    val params = new String(bytes, magic.length, eol - magic.length,
      java.nio.charset.StandardCharsets.US_ASCII)
      .split(" ").filter(_.nonEmpty)
    var w = -1; var h = -1; var fn = -1; var fd = -1
    var c420 = true // colorspace optional; default C420
    def num(s: String): Int =
      if (s.nonEmpty && s.forall(ch => ch >= '0' && ch <= '9') &&
          s.length <= 9) s.toInt else -1
    params.foreach { p =>
      p.head match {
        case 'W' => w = num(p.tail)
        case 'H' => h = num(p.tail)
        case 'F' => p.tail.split(":") match {
          case Array(a, b) => fn = num(a); fd = num(b)
          case _ => ()
        }
        case 'C' => c420 = p.tail.startsWith("420")
        case _ => () // Ip/A/X… — skipped
      }
    }
    if (w <= 0 || h <= 0 || w % 2 != 0 || h % 2 != 0 ||
        fn <= 0 || fd <= 0 || !c420) return None
    // geometry in Long: W/H admit 9 digits each, so w*h*3 wraps Int for
    // crafted headers (frameBytes 0/negative → copyOfRange throws instead
    // of decode returning None). Only the Int-range bound lives here — a
    // zero-frame clip's payload is legitimately shorter than one frame,
    // so the per-frame Long bounds check below does the size rejection.
    val fb = w.toLong * h * 3 / 2
    if (fb > Int.MaxValue) return None
    val frameBytes = fb.toInt
    val frames = Vector.newBuilder[Array[Byte]]
    var pos = eol + 1
    while (pos < bytes.length) {
      // each frame: "FRAME[ params]\n" then the raw planes
      if (pos + 5 > bytes.length ||
          new String(bytes, pos, 5,
            java.nio.charset.StandardCharsets.US_ASCII) != "FRAME")
        return None
      var fe = pos + 5
      while (fe < bytes.length && bytes(fe) != '\n') fe += 1
      if (fe >= bytes.length || fe.toLong + 1 + frameBytes > bytes.length)
        return None
      frames += java.util.Arrays.copyOfRange(bytes, fe + 1,
        fe + 1 + frameBytes)
      pos = fe + 1 + frameBytes
    }
    Some(Video(w, h, fn, fd, frames.result()))
  }

  /** Exact statistics from decoded planes: total luma sum, and the
    * frame-to-frame sum of |ΔY| (both Long — a 2-hour 4K clip is ~10¹²
    * per-pixel terms, far inside Long). Duration floors to ms. */
  def stats(v: Video): Stats = {
    val wh = v.width * v.height
    var lumaSum = 0L; var motionSum = 0L
    var f = 0
    while (f < v.frames.size) {
      val cur = v.frames(f)
      val prev = if (f > 0) v.frames(f - 1) else null
      var i = 0
      while (i < wh) {
        lumaSum += cur(i) & 0xff
        if (prev != null)
          motionSum += math.abs((cur(i) & 0xff) - (prev(i) & 0xff))
        i += 1
      }
      f += 1
    }
    val durMs = v.frames.size.toLong * 1000L * v.fpsDen / v.fpsNum
    Stats(v.width, v.height, v.frames.size, durMs, lumaSum, motionSum)
  }
}
