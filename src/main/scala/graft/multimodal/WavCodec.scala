package graft.multimodal

/** Pure-Scala codec for RIFF/WAVE PCM 16-bit — the audio analog of
  * [[PpmCodec]]: no audio library exists in this environment, and none
  * is needed for canonical PCM WAV, so the multimodal audio path becomes
  * REAL sample math (decode, duration/RMS/peak/clipping stats) end to
  * end. [[Y4mCodec]] does the same for raw video; only compressed
  * codecs (JPEG/MP3/H.264) remain stubbed.
  *
  * The parser walks the RIFF chunk list (accepting extra chunks such as
  * LIST/INFO between fmt and data, and odd-sized chunks' pad bytes), and
  * requires audioFormat=1 (PCM), bitsPerSample=16. The writer emits the
  * canonical 44-byte single-fmt/single-data layout, which is what the
  * SQL oracle's byte-length arithmetic assumes.
  *
  * All stats are exact integer arithmetic (sums of squares in Long; the
  * only floating step is one IEEE divide + sqrt, both correctly rounded,
  * so a SQL engine replays them bit-for-bit).
  */
object WavCodec {

  /** Decoded clip: interleaved 16-bit samples. `frames` = samples per
    * channel. */
  final case class Clip(sampleRate: Int, channels: Int,
                        samples: Array[Short]) {
    require(channels > 0 && samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels channels")
    def frames: Int = samples.length / channels
  }

  /** Exact per-clip statistics (the audio-curation gate's inputs). */
  final case class Stats(sampleRate: Int, channels: Int, frames: Int,
                         durationMs: Long, sumSquares: Long, peak: Int,
                         clipped: Long, zeroCrossings: Long) {
    /** Root-mean-square amplitude: the one floating-point step (IEEE
      * divide + sqrt — both correctly rounded, engine-portable). */
    def rms: Double =
      if (frames == 0) 0.0
      else math.sqrt(sumSquares.toDouble / (frames.toLong * channels))
  }

  private val Pcm = 1

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Canonical 44-byte-header PCM16 encoding. */
  def encode(clip: Clip): Array[Byte] = {
    val dataLen = clip.samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    le32(out, 16, 16)                              // fmt chunk size
    le16(out, 20, Pcm)                             // audioFormat
    le16(out, 22, clip.channels)
    le32(out, 24, clip.sampleRate)
    le32(out, 28, clip.sampleRate * clip.channels * 2) // byte rate
    le16(out, 32, clip.channels * 2)               // block align
    le16(out, 34, 16)                              // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    le32(out, 40, dataLen)
    var i = 0
    while (i < clip.samples.length) {
      le16(out, 44 + i * 2, clip.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a PCM16 WAV; None when the bytes are not one (the dispatch
    * test the multimodal stages use — payloads are self-describing).
    * Total: corrupt payloads degrade to None, never fail the task. */
  def decode(bytes: Array[Byte]): Option[Clip] =
    try decodeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte]): Option[Clip] = {
    if (bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var pos = 12
    var rate = 0; var channels = 0; var ok = false
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length && (data == null || !ok)) {
      val id = tag(bytes, pos)
      val size = rd32(bytes, pos + 4)
      // Long arithmetic: size near 2^31 would wrap `pos + 8 + size`
      // negative and slip past this bound (then ~2 GB alloc / AIOOBE)
      if (size < 0 || pos.toLong + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val fmt = rd16(bytes, pos + 8)
          channels = rd16(bytes, pos + 10)
          rate = rd32(bytes, pos + 12)
          val bits = rd16(bytes, pos + 22)
          if (fmt != Pcm || bits != 16 || channels <= 0 || rate <= 0)
            return None
          ok = true
        case "data" =>
          if (size % 2 != 0) return None
          val n = size / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) {
            s(i) = ((bytes(pos + 8 + i * 2) & 0xff) |
              (bytes(pos + 9 + i * 2) << 8)).toShort
            i += 1
          }
          data = s
        case _ => () // LIST/INFO/etc — skipped
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned (pad byte)
    }
    if (ok && data != null && data.length % channels == 0)
      Some(Clip(rate, channels, data))
    else None
  }

  /** Exact statistics from decoded samples. Clipping = |s| ≥ 32767
    * (both rails); zero-crossings counted on channel 0's sign changes
    * (zero is non-negative). */
  def stats(clip: Clip): Stats = {
    var sumSq = 0L; var peak = 0; var clipped = 0L; var zc = 0L
    var prevNeg = false; var first = true
    var i = 0
    while (i < clip.samples.length) {
      val s = clip.samples(i).toInt
      val a = math.abs(s)
      sumSq += s.toLong * s
      if (a > peak) peak = a
      if (a >= 32767) clipped += 1
      if (i % clip.channels == 0) { // channel 0
        val neg = s < 0
        if (!first && neg != prevNeg) zc += 1
        prevNeg = neg; first = false
      }
      i += 1
    }
    val durMs =
      if (clip.sampleRate == 0) 0L
      else clip.frames.toLong * 1000L / clip.sampleRate
    Stats(clip.sampleRate, clip.channels, clip.frames, durMs, sumSq,
      peak, clipped, zc)
  }
}
