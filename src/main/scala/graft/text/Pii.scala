package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection / redaction for a training-data pipeline: find and mask
  * emails, NANP-style phone numbers, and IPv4 addresses in a text column.
  *
  * Mirrors the scrubbing stage every large-corpus pipeline runs before
  * training (C4 and its descendants drop or mask address-like spans).
  * Patterns are deliberately RE2-safe (no backreferences, no lookaround)
  * so the identical regex runs in Java (Spark codegen) and in the DuckDB
  * oracle.
  *
  * Built from codegen'd builtins only — a 100 TB scrub pass stays inside
  * WholeStageCodegen with `text` as the single read column.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val IpRe    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  def emailCount(text: Column): Column = countMatches(text, EmailRe)
  def phoneCount(text: Column): Column = countMatches(text, PhoneRe)
  def ipCount(text: Column): Column    = countMatches(text, IpRe)

  /** Mask all three PII classes. Email first (its domain contains dots
    * that the IP pattern could otherwise chew on), then phone, then IP. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")

  // ------------------------------------------------------- fused scrub

  private lazy val EmailP = java.util.regex.Pattern.compile(EmailRe)
  private lazy val PhoneP = java.util.regex.Pattern.compile(PhoneRe)
  private lazy val IpP    = java.util.regex.Pattern.compile(IpRe)

  /** One-pass-per-pattern scrub: (redacted text, n_email+n_phone+n_ip).
    * Same engine (java.util.regex), same patterns, same sequential
    * replace order as [[redact]], and counts over the ORIGINAL text as
    * the three count columns — so the struct is value-identical to the
    * 4-expression form while scanning the text 4 times instead of 6
    * (email count+replace share one matcher pass; no match-array
    * materialization for the counts; a cheap charset pre-scan skips
    * whole patterns when their alphabet is absent).
    *
    * MEASURED A WASH at sf0.1 (AbBench `pii_fused_scrub`, ratio 1.01
    * on the q317 chain where every row carries PII): the UDF ser/de
    * boundary costs what the two saved regex passes buy, so the
    * declared queries keep the codegen'd 4-expression form. Kept as
    * the measured alternative — on PII-sparse corpora the charset
    * pre-scan short-circuits whole patterns and this form wins. */
  val scrubUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) null
      else {
        var hasAt = false; var hasDigit = false
        var i = 0
        while (i < text.length && !(hasAt && hasDigit)) {
          val c = text.charAt(i)
          if (c == '@') hasAt = true
          else if (c >= '0' && c <= '9') hasDigit = true
          i += 1
        }
        var n = 0L
        // email: count and replace in ONE matcher pass (pass 1 runs on
        // the original text, so its replacement count IS emailCount)
        var t1 = text
        if (hasAt) {
          val m = EmailP.matcher(text)
          val sb = new java.lang.StringBuilder()
          var last = 0
          while (m.find()) {
            n += 1
            sb.append(text, last, m.start()).append("<EMAIL>")
            last = m.end()
          }
          if (last > 0) { sb.append(text, last, text.length); t1 = sb.toString }
        }
        var t2 = t1
        if (hasDigit) {
          // phone/ip counts run on the ORIGINAL text (independent
          // per-pattern counts, exactly the 3-count sum's semantics)
          val mc = PhoneP.matcher(text)
          while (mc.find()) n += 1
          val mi = IpP.matcher(text)
          while (mi.find()) n += 1
          t2 = IpP.matcher(PhoneP.matcher(t1).replaceAll("<PHONE>"))
            .replaceAll("<IP>")
        }
        (t2, n)
      }
    }
}
