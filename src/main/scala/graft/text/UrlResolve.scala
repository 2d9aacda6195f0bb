package graft.text

import org.apache.spark.sql.functions.udf

/** RFC 3986 relative-reference resolution — the frontier's growth
  * edge: a fetched page's links are mostly RELATIVE (`c/d.html`,
  * `../up`, `/rooted`, `//host/x`, `?q=2`), and until they are
  * resolved against the page's own URL they cannot be canonicalized
  * ([[UrlCanon]]), robots-gated, or deduped. The reference's
  * deep-crawl does this with `urljoin` (`/root/reference/src/utils/
  * helpers.py:56-84` builds absolute URLs before enqueueing); this is
  * the same §5 algorithm, explicit and oracle-replayable.
  *
  * Implements RFC 3986 §5.2 verbatim:
  *   - a ref WITH a scheme is already absolute (its path still gets
  *     dot-segment removal, §5.2.2's non-strict option is NOT taken);
  *   - `//authority/path` takes the base's scheme only;
  *   - an empty ref or `#frag` keeps the base's path AND query;
  *   - `?query` keeps the base's path, replaces the query;
  *   - a rooted path replaces, a relative path MERGES (§5.2.3: base
  *     path up to its last `/`) — both then dot-segment-normalize
  *     (§5.2.4: `.` and `..` segments consumed, `..` at root is
  *     swallowed, never escapes).
  *
  * Pinned against the RFC's OWN test table (§5.4.1 normal + §5.4.2
  * abnormal examples) in UrlResolveSpec.
  *
  * Returns None when the base is not absolute-with-authority (no
  * `scheme://`) — the NULL-dispatch contract; a malformed base must
  * never fail the scan. The resolved URL keeps the ref's fragment:
  * dropping fragments is [[UrlCanon]]'s decision, downstream.
  *
  * Scale: a pure per-row projection (string scan, no allocation
  * beyond the output) riding the page scan's partitioning.
  */
object UrlResolve {

  /** (scheme, authority, path, query, fragment) — RFC 3986 appendix B
    * decomposition; query/fragment are null when their delimiter is
    * absent (empty string when present but empty — the distinction
    * §5.2 needs). */
  private final case class Parts(scheme: String, authority: String,
                                 path: String, query: String, fragment: String)

  private def split(u: String): Parts = {
    var s = u
    var fragment: String = null
    val hash = s.indexOf('#')
    if (hash >= 0) { fragment = s.substring(hash + 1); s = s.substring(0, hash) }
    var query: String = null
    val q = s.indexOf('?')
    if (q >= 0) { query = s.substring(q + 1); s = s.substring(0, q) }
    var scheme: String = null
    val colon = s.indexOf(':')
    if (colon > 0) {
      // appendix B: scheme = ALPHA *( ALPHA / DIGIT / + / - / . ) up
      // to the first colon; a slash or invalid char before the colon
      // means the colon sits inside a path segment, not a scheme
      // (and per §5.4.1 the bare "g:h" ref IS scheme'd)
      val cand = s.substring(0, colon)
      val ok = cand.charAt(0).isLetter && cand.forall(c =>
        c.isLetterOrDigit || c == '+' || c == '-' || c == '.')
      if (ok) { scheme = cand; s = s.substring(colon + 1) }
    }
    var authority: String = null
    if (s.startsWith("//")) {
      var e = 2
      while (e < s.length && s.charAt(e) != '/' && s.charAt(e) != '?') e += 1
      authority = s.substring(2, e)
      s = s.substring(e)
    }
    Parts(scheme, authority, s, query, fragment)
  }

  /** §5.2.4 remove_dot_segments, the RFC's buffer algorithm verbatim
    * (it is subtle enough — trailing `/.`, root `..`, `//` runs —
    * that a "clever" segment-split version gets the corners wrong).
    * O(n): the output buffer only ever appends or drops whole
    * segments. */
  private[graft] def removeDotSegments(path: String): String = {
    val in = new java.lang.StringBuilder(path)
    val out = new java.lang.StringBuilder(path.length)
    def startsWith(p: String): Boolean =
      in.length >= p.length && in.indexOf(p) == 0
    while (in.length > 0) {
      if (startsWith("../")) in.delete(0, 3)
      else if (startsWith("./")) in.delete(0, 2)
      else if (startsWith("/./")) in.replace(0, 3, "/")
      else if (in.toString == "/.") in.replace(0, 2, "/")
      else if (startsWith("/../")) {
        in.replace(0, 4, "/")
        val cut = out.lastIndexOf("/")
        out.setLength(if (cut < 0) 0 else cut)
      } else if (in.toString == "/..") {
        in.replace(0, 3, "/")
        val cut = out.lastIndexOf("/")
        out.setLength(if (cut < 0) 0 else cut)
      } else if (in.toString == "." || in.toString == "..") in.setLength(0)
      else {
        // move the first segment (incl. a leading /, excl. the next /)
        var e = if (in.charAt(0) == '/') 1 else 0
        while (e < in.length && in.charAt(e) != '/') e += 1
        out.append(in, 0, e)
        in.delete(0, e)
      }
    }
    out.toString
  }

  /** §5.2.3 merge: base path up to its last slash + the ref path; an
    * authority'd base with an EMPTY path contributes "/". */
  private def merge(base: Parts, refPath: String): String = {
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val cut = base.path.lastIndexOf('/')
      if (cut < 0) refPath else base.path.substring(0, cut + 1) + refPath
    }
  }

  private def recompose(scheme: String, authority: String, path: String,
                        query: String, fragment: String): String = {
    val sb = new StringBuilder()
    if (scheme != null) sb.append(scheme).append(':')
    if (authority != null) sb.append("//").append(authority)
    sb.append(path)
    if (query != null) sb.append('?').append(query)
    if (fragment != null) sb.append('#').append(fragment)
    sb.toString
  }

  /** Resolve `ref` against absolute `base` (RFC 3986 §5.2.2 strict).
    * None when base has no `scheme://authority` or ref is null. */
  def resolve(base: String, ref: String): Option[String] = {
    if (base == null || ref == null) return None
    val b = split(base)
    if (b.scheme == null || b.authority == null) return None
    val r = split(ref)
    val t: Parts =
      if (r.scheme != null)
        Parts(r.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.authority != null)
        Parts(b.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.path.isEmpty)
        Parts(b.scheme, b.authority, b.path,
          if (r.query != null) r.query else b.query, r.fragment)
      else if (r.path.charAt(0) == '/')
        Parts(b.scheme, b.authority, removeDotSegments(r.path), r.query, r.fragment)
      else
        Parts(b.scheme, b.authority, removeDotSegments(merge(b, r.path)),
          r.query, r.fragment)
    Some(recompose(t.scheme, t.authority, t.path, t.query, t.fragment))
  }

  /** `url_resolve(base, ref)` — absolute URL or NULL. */
  val resolveUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (base: String, ref: String) => resolve(base, ref) }
}
