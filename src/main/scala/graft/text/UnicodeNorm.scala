package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Unicode normalization — the projection every text-dedup stage must
  * run FIRST: the same visible string arrives from the web in composed
  * (é = U+00E9) and decomposed (e + U+0301) forms, and a hash-grain
  * dedup (MinHash shingles, exact md5, window fingerprints) treats
  * them as different documents unless the corpus is normalized to one
  * form. The reference normalizes implicitly (Python's html/requests
  * stack emits NFC); a JVM engine must do it explicitly.
  *
  * All three transforms are per-cell `java.text.Normalizer` calls —
  * O(bytes), no state, codegen-adjacent (one virtual call per row) —
  * so the 100 TB cost is the scan itself.
  *
  *   - [[nfc]]: canonical composition (the web-interchange form, what
  *     DuckDB's `nfc_normalize` produces — oracle-matched in q290);
  *   - [[nfkc]]: compatibility composition (ligatures/width folds;
  *     the tokenizer-prep form — NO DuckDB counterpart, so it is
  *     spec-pinned rather than driver-gated);
  *   - [[stripAccents]]: NFD, drop combining marks (Mn), NFC — the
  *     accent-insensitive key for fuzzy joins (DuckDB
  *     `strip_accents` behaves identically on Latin input).
  */
object UnicodeNorm {

  def nfcStr(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  def nfkcStr(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)

  private val MnPattern = java.util.regex.Pattern.compile("\\p{Mn}+")

  def stripAccentsStr(s: String): String = {
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val bare = MnPattern.matcher(nfd).replaceAll("")
    java.text.Normalizer.normalize(bare, java.text.Normalizer.Form.NFC)
  }

  /** `nfc(text)` — canonical-composed form; NULL in, NULL out. */
  val nfc: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) => Option(s).map(nfcStr).orNull }

  /** `nfkc(text)` — compatibility-composed form. */
  val nfkc: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) => Option(s).map(nfkcStr).orNull }

  /** `strip_accents(text)` — combining marks removed, recomposed. */
  val stripAccents: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) => Option(s).map(stripAccentsStr).orNull }

  /** The case-insensitive accent-insensitive dedup key: NFC →
    * strip accents → locale-free lowercase. */
  def foldKey(c: Column): Column =
    org.apache.spark.sql.functions.lower(stripAccents(nfc(c)))
}
