package graft.multimodal

/** Pure-Scala codec for binary PPM (P6, maxval 255) — the simplest
  * self-describing raster format: `P6\n<width> <height>\n255\n` followed
  * by `width*height*3` RGB bytes. No external imaging library exists in
  * this environment, and none is needed for P6; this makes the
  * multimodal image path REAL pixel math (decode, nearest-neighbor
  * resize, channel statistics) end to end, while audio/video decode
  * stays a declared stub.
  *
  * The parser accepts the format's full header grammar (any whitespace
  * between tokens, `#` comments through end-of-line) so images produced
  * by external tools decode too; the writer emits the canonical
  * single-space/newline form, which is what the SQL oracle's
  * byte-length arithmetic assumes.
  */
object PpmCodec {

  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3,
      s"P6 payload ${rgb.length} != $width*$height*3")

    /** Pixel channel value 0..255 at (x, y, channel 0=R 1=G 2=B). */
    def at(x: Int, y: Int, ch: Int): Int =
      rgb((y * width + x) * 3 + ch) & 0xff
  }

  /** Canonical P6 encoding: `P6\n<w> <h>\n255\n<rgb>`. */
  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Decode a P6 image; None when the bytes are not a well-formed P6
    * (the dispatch test the multimodal stages use — media payloads are
    * self-describing, so "is it an image" is answered by the bytes, not
    * by trusted metadata). Total: decode is the dispatch test inside
    * UDFs over arbitrary binary content, so a malformed payload must
    * degrade to None (→ stub featurizer), never fail the Spark task. */
  def decode(bytes: Array[Byte]): Option[Image] =
    try decodeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    // one header token: skip whitespace and # comments, read digits
    def token(): Option[Int] = {
      var inComment = false
      while (pos < bytes.length &&
             (inComment || bytes(pos) == ' ' || bytes(pos) == '\n' ||
              bytes(pos) == '\r' || bytes(pos) == '\t' || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n' || bytes(pos) == '\r') inComment = false
        pos += 1
      }
      val start = pos
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) return None
        pos += 1
      }
      if (pos == start) None else Some(v.toInt)
    }
    for {
      w <- token()
      h <- token()
      maxval <- token()
      if maxval == 255 && w > 0 && h > 0
      // exactly ONE whitespace byte separates the header from the raster
      if pos < bytes.length &&
        (bytes(pos) == '\n' || bytes(pos) == ' ' ||
         bytes(pos) == '\r' || bytes(pos) == '\t')
      if bytes.length - (pos + 1) == w * h * 3
    } yield Image(w, h,
      java.util.Arrays.copyOfRange(bytes, pos + 1, bytes.length))
  }

  /** Nearest-neighbor resize with INTEGER source mapping —
    * `src_x = x * w0 / w1` (integer division) — so the SQL oracle can
    * replay every output pixel exactly. */
  def resizeNearest(img: Image, w1: Int, h1: Int): Image = {
    require(w1 > 0 && h1 > 0, s"resize target ${w1}x$h1 must be positive")
    val out = new Array[Byte](w1 * h1 * 3)
    var y = 0
    while (y < h1) {
      val sy = y * img.height / h1
      var x = 0
      while (x < w1) {
        val sx = x * img.width / w1
        val src = (sy * img.width + sx) * 3
        val dst = (y * w1 + x) * 3
        out(dst) = img.rgb(src)
        out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Image(w1, h1, out)
  }

  /** 16-dim image feature vector from DECODED pixels: per-channel means
    * (R, G, B, each /255) then a 13-bin luminance histogram (luma =
    * (r+g+b)/3 integer, bin = luma*13/256, counts normalized by pixel
    * count). All sums are exact integer arithmetic in double — bit-equal
    * to the oracle's replay regardless of accumulation order. */
  def features(img: Image): Array[Float] = {
    val n = img.width * img.height
    val sums = new Array[Long](3)
    val hist = new Array[Long](13)
    var i = 0
    while (i < n) {
      val r = img.rgb(i * 3) & 0xff
      val g = img.rgb(i * 3 + 1) & 0xff
      val b = img.rgb(i * 3 + 2) & 0xff
      sums(0) += r; sums(1) += g; sums(2) += b
      hist((r + g + b) / 3 * 13 / 256) += 1
      i += 1
    }
    val out = new Array[Float](16)
    var c = 0
    while (c < 3) {
      out(c) = (sums(c).toDouble / n / 255.0).toFloat; c += 1
    }
    var bin = 0
    while (bin < 13) {
      out(3 + bin) = (hist(bin).toDouble / n).toFloat; bin += 1
    }
    out
  }
}
