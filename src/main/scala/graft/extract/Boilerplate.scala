package graft.extract

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Block-level boilerplate removal (justext/trafilatura-shape): web
  * pages are nav + ads + footer wrapped around the content, and a
  * training corpus that keeps the wrapper trains on "home about
  * contact copyright" millions of times. The CCNet line-frequency
  * dedup (q200/q201) removes boilerplate CROSS-document; this is the
  * complementary SINGLE-document classifier — no corpus state, a pure
  * projection, so it runs in the ingest pass before anything else.
  *
  * Segmentation: a linear tag scan collects the text of each
  * TOP-LEVEL block element (p, div, li, td, h1-h6, header, footer,
  * nav, section, article); nested block tags contribute their text to
  * the enclosing block (the flatten justext applies), same-tag nesting
  * is depth-counted to find the real close, inline tags are stripped,
  * and chars inside `<a>` accumulate the block's link mass.
  *
  * Classification (the justext core, deterministically simplified):
  * a block is CONTENT iff it has at least `minWords` words AND its
  * link density (link chars / text chars) is below `maxLinkDensity`.
  * Short blocks and link lists — nav bars, ad strips, footers — fail
  * one test each; body paragraphs pass both. The q296 oracle replays
  * the decision from the generator's block formulas, so a
  * misclassified block changes n_kept AND the kept-text md5.
  */
object Boilerplate {

  final case class Block(tag: String, text: String, linkChars: Int) {
    def words: Int = {
      val t = text.trim
      if (t.isEmpty) 0 else t.split("\\s+").length
    }
    def linkDensity2x: Boolean = linkChars * 2 >= math.max(1, text.trim.length)
  }

  private val BlockTags: Set[String] = Set("p", "div", "li", "td",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "footer", "nav",
    "section", "article", "blockquote", "pre")

  private val TagRe =
    java.util.regex.Pattern.compile("<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*>")

  /** Top-level block elements with flattened inner text. */
  def blocks(html: String): Seq[Block] = {
    if (html == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val m = TagRe.matcher(html)
    var pos = 0
    var cur: StringBuilder = null
    var curTag: String = null
    var sameDepth = 0
    var aDepth = 0
    var linkChars = 0
    while (m.find()) {
      if (cur != null && m.start() > pos) {
        val t = html.substring(pos, m.start())
        cur.append(t)
        if (aDepth > 0) linkChars += t.length
      }
      val closing = m.group(1).nonEmpty
      val tag = m.group(2).toLowerCase(java.util.Locale.ROOT)
      if (cur == null) {
        if (!closing && BlockTags.contains(tag)) {
          cur = new StringBuilder; curTag = tag; sameDepth = 1
          aDepth = 0; linkChars = 0
        }
      } else {
        if (tag == curTag) {
          if (closing) {
            sameDepth -= 1
            if (sameDepth == 0) {
              out += Block(curTag, cur.toString, linkChars)
              cur = null; curTag = null
            }
          } else sameDepth += 1
        } else if (tag == "a") {
          if (closing) aDepth = math.max(0, aDepth - 1) else aDepth += 1
        }
        // other tags (inline or nested block): stripped, text flattens
      }
      pos = m.end()
    }
    // unterminated trailing block: capture the tail text and emit
    // what was collected (tolerant)
    if (cur != null) {
      if (pos < html.length) {
        val t = html.substring(pos)
        cur.append(t)
        if (aDepth > 0) linkChars += t.length
      }
      out += Block(curTag, cur.toString, linkChars)
    }
    out.toSeq
  }

  /** The kept-content verdict: (n_blocks, n_kept, kept text joined by
    * newline). Whitespace inside blocks is preserved as written. */
  def extract(html: String, minWords: Int = 10): (Int, Int, String) = {
    val bs = blocks(html)
    val kept = bs.filter(b => b.words >= minWords && !b.linkDensity2x)
    (bs.length, kept.length, kept.map(_.text).mkString("\n"))
  }

  /** `content_blocks(html)` → struct(n_blocks, n_kept, kept). */
  def extractUdf(minWords: Int = 10): UserDefinedFunction =
    udf { (html: String) =>
      val (nb, nk, kept) = extract(html, minWords)
      (nb.toLong, nk.toLong, kept)
    }
}
