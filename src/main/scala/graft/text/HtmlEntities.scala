package graft.text

import org.apache.spark.sql.functions.udf

/** HTML character-reference decoding — the normalization pass between
  * tag-stripping (graft.extract.Boilerplate / HtmlParse) and every
  * content hash: the same visible text arrives as `Tom & Jerry`,
  * `Tom &amp; Jerry`, `Tom &#38; Jerry` and `Tom &#x26; Jerry`, and
  * unless references are decoded first, exact dedup, MinHash shingles
  * and the q290 fold key all see four distinct documents. The
  * reference never wrote this step because BeautifulSoup decodes
  * entities implicitly on parse (`/root/reference/src/extractor/
  * service.py` reads `.text` off soup nodes); a byte-level engine has
  * to do it explicitly.
  *
  * Decoding rules (the HTML5 tokenizer's, reduced to the deterministic
  * subset an oracle can replay):
  *
  *   - `&#D;` / `&#xH;` numeric references decode to the codepoint,
  *     EXCEPT: NUL, surrogates (U+D800–DFFF) and out-of-range
  *     (> U+10FFFF) become U+FFFD, and the C1 block 0x80–0x9F maps
  *     through the windows-1252 table (HTML5 §13.2.5.80's
  *     character-reference-code table — `&#147;` means a curly quote,
  *     not a control char, because legacy pages wrote cp1252 bytes as
  *     numeric refs).
  *   - `&name;` decodes when `name` is in the table (case-sensitive,
  *     per spec: `&Amp;` is NOT a reference).
  *   - `&name` WITHOUT the semicolon decodes only for the legacy
  *     bare-name set (the HTML4 survivors browsers still honor) and
  *     only when the next char could not extend a reference (not
  *     alphanumeric, not `=` — the attribute-value guard).
  *   - Anything else (`&unknown;`, `&#;`, `&#xZZ;`, bare `&`) passes
  *     through VERBATIM — a malformed reference must never lose bytes.
  *
  * NOT done (documented deviation from the full HTML5 tokenizer):
  * LONGEST-PREFIX matching of bare names. The browser tokenizer
  * consumes the longest table prefix of an alphanumeric run, so
  * `&ampx` decodes to `&x` in text content; this decoder requires the
  * ENTIRE run to be a known legacy name, so `&ampx` passes through
  * verbatim. Stricter-than-spec is the right default for a dedup
  * key — it never invents characters that weren't visibly intended —
  * but a user diffing output against a browser DOM will see this
  * class differ. Spec-pinned in HtmlEntitiesSpec ("&ampx passthrough").
  *
  * One linear pass, no allocation when the input has no `&`. A pure
  * per-row projection: rides the scan's partitioning, no shuffle.
  */
object HtmlEntities {

  /** Named references (semicolon form). The common-web subset: the
    * XML five + typographic punctuation + Latin-1 letters + currency
    * and math signs that actually occur in crawled corpora. */
  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> "\u00A0", "shy" -> "\u00AD",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "plusmn" -> "±", "sup2" -> "²",
    "sup3" -> "³", "micro" -> "µ", "para" -> "¶",
    "middot" -> "·", "frac14" -> "¼", "frac12" -> "½",
    "frac34" -> "¾", "times" -> "×", "divide" -> "÷",
    "cent" -> "¢", "pound" -> "£", "curren" -> "¤",
    "yen" -> "¥", "sect" -> "§", "euro" -> "€",
    "hellip" -> "…", "mdash" -> "—", "ndash" -> "–",
    "lsquo" -> "‘", "rsquo" -> "’", "sbquo" -> "‚",
    "ldquo" -> "“", "rdquo" -> "”", "bdquo" -> "„",
    "laquo" -> "«", "raquo" -> "»", "bull" -> "•",
    "dagger" -> "†", "Dagger" -> "‡", "permil" -> "‰",
    "prime" -> "′", "Prime" -> "″", "oline" -> "‾",
    "frasl" -> "⁄", "minus" -> "−", "lowast" -> "∗",
    "radic" -> "√", "infin" -> "∞", "ne" -> "≠",
    "le" -> "≤", "ge" -> "≥", "larr" -> "←",
    "uarr" -> "↑", "rarr" -> "→", "darr" -> "↓",
    "harr" -> "↔", "agrave" -> "à", "aacute" -> "á",
    "acirc" -> "â", "atilde" -> "ã", "auml" -> "ä",
    "aring" -> "å", "aelig" -> "æ", "ccedil" -> "ç",
    "egrave" -> "è", "eacute" -> "é", "ecirc" -> "ê",
    "euml" -> "ë", "igrave" -> "ì", "iacute" -> "í",
    "icirc" -> "î", "iuml" -> "ï", "ntilde" -> "ñ",
    "ograve" -> "ò", "oacute" -> "ó", "ocirc" -> "ô",
    "otilde" -> "õ", "ouml" -> "ö", "oslash" -> "ø",
    "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û",
    "uuml" -> "ü", "yacute" -> "ý", "yuml" -> "ÿ",
    "szlig" -> "ß", "thorn" -> "þ", "eth" -> "ð",
    "Agrave" -> "À", "Aacute" -> "Á", "Auml" -> "Ä",
    "Ccedil" -> "Ç", "Eacute" -> "É", "Ntilde" -> "Ñ",
    "Ouml" -> "Ö", "Uuml" -> "Ü")

  /** Bare-name (no semicolon) survivors — the HTML4 legacy set
    * browsers still decode in text content. */
  private val LegacyBare: Set[String] =
    Set("amp", "lt", "gt", "quot", "nbsp", "copy", "reg")

  /** C1 remap 0x80–0x9F → windows-1252 (HTML5 character-reference-code
    * table; same table as graft.ingest.CharsetSniff's decoder). */
  private val C1Remap: Array[Char] = Array(
    '€', '\u0081', '‚', 'ƒ', '„', '…',
    '†', '‡', 'ˆ', '‰', 'Š', '‹',
    'Œ', '\u008D', 'Ž', '\u008F', '\u0090', '‘',
    '’', '“', '”', '•', '–', '—',
    '˜', '™', 'š', '›', 'œ', '\u009D',
    'ž', 'Ÿ')

  private val MaxNameLen = 10 // longest key in Named ("divide"=6, pad)

  private def appendCodepoint(sb: java.lang.StringBuilder, cp: Int): Unit = {
    val fixed =
      if (cp == 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) 0xFFFD
      else if (cp >= 0x80 && cp <= 0x9F) C1Remap(cp - 0x80).toInt
      else cp
    sb.appendCodePoint(fixed)
  }

  /** Decode all character references in `s`; malformed ones pass
    * through verbatim. Returns `s` itself when no `&` occurs. */
  def decode(s: String): String = {
    if (s == null) return null
    var amp = s.indexOf('&')
    if (amp < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (amp >= 0) {
      sb.append(s, i, amp)
      val consumed = decodeOne(s, amp, sb)
      i = amp + (if (consumed > 0) consumed else { sb.append('&'); 1 })
      amp = s.indexOf('&', i)
    }
    sb.append(s, i, s.length)
    sb.toString
  }

  /** Try to decode one reference at `s(amp) == '&'`; appends the
    * replacement and returns chars consumed, or 0 when not a
    * reference (caller emits the '&' verbatim). */
  private def decodeOne(s: String, amp: Int, sb: java.lang.StringBuilder): Int = {
    val n = s.length
    if (amp + 1 >= n) return 0
    if (s.charAt(amp + 1) == '#') {
      var j = amp + 2
      var hex = false
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hex = true; j += 1 }
      val digits0 = j
      var cp = 0L
      while (j < n && isDigitOf(s.charAt(j), hex)) {
        cp = cp * (if (hex) 16 else 10) + digitVal(s.charAt(j))
        if (cp > 0x110000L) cp = 0x110001L // clamp: still "out of range"
        j += 1
      }
      if (j == digits0) return 0 // "&#;" / "&#x;" / "&#z": not a ref
      if (j >= n || s.charAt(j) != ';') return 0 // numeric NEEDS the ;
      appendCodepoint(sb, cp.toInt.min(0x110001))
      j + 1 - amp
    } else {
      var j = amp + 1
      val limit = math.min(n, amp + 1 + MaxNameLen)
      while (j < limit && s.charAt(j).isLetterOrDigit) j += 1
      val name = s.substring(amp + 1, j)
      if (name.isEmpty) return 0
      if (j < n && s.charAt(j) == ';') {
        Named.get(name) match {
          case Some(rep) => sb.append(rep); j + 1 - amp
          case None      => 0
        }
      } else if (LegacyBare.contains(name) &&
        (j >= n || (!s.charAt(j).isLetterOrDigit && s.charAt(j) != '='))) {
        sb.append(Named(name)); j - amp
      } else 0
    }
  }

  private def isDigitOf(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') ||
      (hex && ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))

  private def digitVal(c: Char): Int =
    if (c <= '9') c - '0'
    else if (c <= 'F') c - 'A' + 10
    else c - 'a' + 10

  /** `decode_entities(s)` — per-row projection. */
  val decodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) => decode(s) }
}
