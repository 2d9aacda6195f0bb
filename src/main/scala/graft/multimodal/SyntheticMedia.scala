package graft.multimodal

/** Deterministic synthetic media payload generators — the ONE copy of
  * each pixel/sample/plane formula shared by the media-gated queries
  * (q36/q168 images, q222 audio, q223 video, q229 tri-modal gate) and
  * [[Multimodal.mediaFromDocuments]]. The DuckDB oracles replay these
  * exact integer formulas, so keeping a single source of truth is what
  * guarantees the Spark bytes and the oracle arithmetic cannot drift
  * apart.
  */
object SyntheticMedia {

  /** P6 raster: `w = d%16+4`, `h = d*7%16+4`, channel byte `c` is
    * `(d*31 + c*7) mod 256`. */
  def ppmPayload(d0: Long): Array[Byte] = {
    val w = (d0 % 16 + 4).toInt
    val h = (d0 * 7 % 16 + 4).toInt
    val rgb = new Array[Byte](w * h * 3)
    var c = 0
    while (c < rgb.length) {
      rgb(c) = ((d0 * 31 + c.toLong * 7) % 256).toByte
      c += 1
    }
    PpmCodec.encode(PpmCodec.Image(w, h, rgb))
  }

  /** Mono PCM16 WAV: rate `8000 + (d%7)*1000`, `n = 100 + d*13 % 900`
    * samples, sample `i` is `(d*31 + i*7919) mod 65536 - 32768`. */
  def wavPayload(d0: Long): Array[Byte] = {
    val rate = (8000L + (d0 % 7) * 1000L).toInt
    val n = (100L + (d0 * 13) % 900L).toInt
    val smp = new Array[Short](n)
    var i = 0
    while (i < n) {
      smp(i) = (((d0 * 31 + i.toLong * 7919) % 65536L) - 32768L).toShort
      i += 1
    }
    WavCodec.encode(WavCodec.Clip(rate, 1, smp))
  }

  /** C420 Y4M clip: `w = 2*((d%8)+2)`, `h = 2*((d*5%8)+2)`,
    * `2 + d%6` frames at `10 + d%5` fps; luma byte `i` of frame `f` is
    * `(d*31 + f*101 + i*7) mod 256` (the audited formula), chroma byte
    * `i` is `(d*7 + f*13 + i*3) mod 256` (real bytes, not audited). */
  def y4mPayload(d0: Long): Array[Byte] = {
    val w = (2L * ((d0 % 8) + 2)).toInt
    val h = (2L * (((d0 * 5) % 8) + 2)).toInt
    val nf = (2L + d0 % 6).toInt
    val fps = (10L + d0 % 5).toInt
    val fb = w * h * 3 / 2
    val frames = Vector.tabulate(nf) { f =>
      val fr = new Array[Byte](fb)
      var i = 0
      while (i < w * h) {
        fr(i) = ((d0 * 31 + f.toLong * 101 + i.toLong * 7) % 256).toByte
        i += 1
      }
      while (i < fb) {
        fr(i) = ((d0 * 7 + f.toLong * 13 + i.toLong * 3) % 256).toByte
        i += 1
      }
      fr
    }
    Y4mCodec.encode(Y4mCodec.Video(w, h, fps, 1, frames))
  }

  /** RGBA PNG (color type 6 — the decode drops alpha, so the audited
    * RGB values are the `c % 4 != 3` bytes): `w = d%12+4`,
    * `h = d*5%12+4`, RGBA byte `c` is `(d*37 + c*11) mod 256`. The
    * payload round-trips through REAL zlib (Deflater/Inflater) and,
    * via the `y % 5` encoder filter schedule, exercises all five
    * scanline filters on every image taller than 4 rows. */
  def pngPayload(d0: Long): Array[Byte] = {
    val w = (d0 % 12 + 4).toInt
    val h = (d0 * 5 % 12 + 4).toInt
    val rgba = new Array[Byte](w * h * 4)
    var c = 0
    while (c < rgba.length) {
      rgba(c) = ((d0 * 37 + c.toLong * 11) % 256).toByte
      c += 1
    }
    PngCodec.encodeRgba(w, h, rgba)
  }

  /** Paletted PNG (color type 3, 8-bit indices): `w = d%10+3`,
    * `h = d*3%10+3`, `n = 2 + d%14` palette entries, entry `j` channel
    * `c` is `(d*13 + j*17 + c*5) mod 256`, pixel `p`'s index is
    * `(d*31 + p*7) mod n` — so decoded pixel `p` channel `c` is
    * `(d*13 + ((d*31 + p*7) mod n)*17 + c*5) mod 256`, a pure integer
    * formula the oracle replays without materializing the palette. */
  def pngPalettePayload(d0: Long): Array[Byte] = {
    val w = (d0 % 10 + 3).toInt
    val h = (d0 * 3 % 10 + 3).toInt
    val n = (2 + d0 % 14).toInt
    val pal = new Array[Byte](n * 3)
    var j = 0
    while (j < n) {
      var c = 0
      while (c < 3) {
        pal(j * 3 + c) = ((d0 * 13 + j.toLong * 17 + c.toLong * 5) % 256).toByte
        c += 1
      }
      j += 1
    }
    val idx = new Array[Byte](w * h)
    var p = 0
    while (p < idx.length) {
      idx(p) = ((d0 * 31 + p.toLong * 7) % n).toByte
      p += 1
    }
    PngCodec.encodePalette(w, h, idx, pal)
  }

  /** 16-bit RGB PNG (color type 2, depth 16): `w = d%9+3`,
    * `h = d*7%9+3`, sample `s` (row-major RGB) is
    * `(d*37 + s*257) mod 65536`; the decoder keeps the HIGH byte, so
    * decoded byte `s` is that value integer-divided by 256. */
  def png16Payload(d0: Long): Array[Byte] = {
    val w = (d0 % 9 + 3).toInt
    val h = (d0 * 7 % 9 + 3).toInt
    val s16 = new Array[Int](w * h * 3)
    var s = 0
    while (s < s16.length) {
      s16(s) = ((d0 * 37 + s.toLong * 257) % 65536).toInt
      s += 1
    }
    PngCodec.encode16(w, h, s16)
  }

  /** FLAC clip: rate `8000 + (d%7)*1000`, channels `1 + d%2`,
    * `3000 + (d*17)%6000` frames (1-3 blocks → the subframe-type and
    * stereo-assignment schedules all fire), interleaved sample `j` is
    * `(d*31 + j*7919) mod 65536 - 32768` — the wavPayload noise formula
    * at FLAC scale, so the oracle replays the decoded PCM exactly. */
  def flacPayload(d0: Long): Array[Byte] = {
    val rate = (8000L + (d0 % 7) * 1000L).toInt
    val ch = (1 + d0 % 2).toInt
    val ns = ch * (3000L + (d0 * 17) % 6000L).toInt
    val smp = new Array[Short](ns)
    var j = 0
    while (j < ns) {
      smp(j) = (((d0 * 31 + j.toLong * 7919) % 65536L) - 32768L).toShort
      j += 1
    }
    FlacCodec.encode(WavCodec.Clip(rate, ch, smp))
  }

  /** Adam7-interlaced 8-bit RGB PNG: `w = d%11+9`, `h = d*3%11+9`
    * (≥ 9 on both axes so all seven passes are nonempty), byte `c` is
    * `(d*41 + c*13) mod 256`. The PIXELS are the plain row-major
    * formula — interlacing only permutes storage, so a correct
    * de-interlace must reproduce exactly the natural-order bytes. */
  def pngAdam7Payload(d0: Long): Array[Byte] = {
    val w = (d0 % 11 + 9).toInt
    val h = (d0 * 3 % 11 + 9).toInt
    val rgb = new Array[Byte](w * h * 3)
    var c = 0
    while (c < rgb.length) {
      rgb(c) = ((d0 * 41 + c.toLong * 13) % 256).toByte
      c += 1
    }
    PngCodec.encodeAdam7(PpmCodec.Image(w, h, rgb))
  }
}
