package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass URL canonicalization kernel — value-identical to
  * [[graft.ext.Urls.canonicalUrlSpec]]'s Column chain (the executable
  * spec, mirrored in DuckDB), pinned by `UrlsSpec`'s equivalence test.
  *
  * Why a kernel: the spec form runs ~15 regex automata per row, each over
  * the full URL, and inlining it into a bigger expression duplicates its
  * input subtree into every regex call (measured: the URL-dedup projection
  * became a >60 KB interpreted expression). This parses the URL ONCE with
  * index scans and rebuilds the canonical form with no regex at all.
  *
  * Exact-parity notes (each mirrors a spec-form quirk, deliberately):
  *  - the scheme must END at the FIRST "://" and validate
  *    `[A-Za-z][A-Za-z0-9+.-]*` from position 0 — otherwise the input
  *    passes through untouched (the regex is anchored and its char class
  *    excludes ':' so it can never match a later "://');
  *  - an EMPTY authority ("https:///x") fails the spec's `[^/?#]+`, so
  *    authority AND path both canonicalize to "" while the query is still
  *    extracted — replicated verbatim;
  *  - the query starts at the first '?' ANYWHERE in the string (the spec's
  *    unanchored `\?([^#]*)`) and ends at the next '#';
  *  - lowercasing goes through [[UTF8String.toLowerCase]] — the same
  *    implementation Spark's `lower` uses — not `java.lang.String`;
  *  - params sort in UTF8 BINARY order ([[UTF8String.compareTo]]), the
  *    `array_sort` default.
  */
object CanonicalUrlKernel {

  private def isSchemeChar(c: Char, first: Boolean): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (!first && ((c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'))

  def canonicalize(u: UTF8String): UTF8String = {
    val s = u.toString
    val sep = s.indexOf("://")
    if (sep <= 0) return u
    var j = 0
    while (j < sep) {
      if (!isSchemeChar(s.charAt(j), j == 0)) return u
      j += 1
    }
    val scheme = UTF8String.fromString(s.substring(0, sep)).toLowerCase.toString
    // authority: after "://" up to the first of / ? #
    val authStart = sep + 3
    var authEnd = authStart
    while (authEnd < s.length && {
      val c = s.charAt(authEnd); c != '/' && c != '?' && c != '#'
    }) authEnd += 1
    var auth = ""
    var path = ""
    if (authEnd > authStart) {
      auth = UTF8String.fromString(s.substring(authStart, authEnd)).toLowerCase.toString
      if (auth.startsWith("www.")) auth = auth.substring(4)
      if (scheme == "https" && auth.endsWith(":443")) auth = auth.dropRight(4)
      else if (scheme == "http" && auth.endsWith(":80")) auth = auth.dropRight(3)
      // path: from the authority's end up to the first of ? # (may be "")
      var pathEnd = authEnd
      while (pathEnd < s.length && {
        val c = s.charAt(pathEnd); c != '?' && c != '#'
      }) pathEnd += 1
      path = s.substring(authEnd, pathEnd)
      var pe = path.length
      while (pe > 0 && path.charAt(pe - 1) == '/') pe -= 1
      path = path.substring(0, pe)
    }
    // query: first '?' anywhere, up to the next '#' (the spec's unanchored
    // extract); params filtered, then sorted in UTF8 binary order
    val q = s.indexOf('?')
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(auth).append(path)
    if (q >= 0) {
      var qEnd = s.indexOf('#', q + 1)
      if (qEnd < 0) qEnd = s.length
      val params = s.substring(q + 1, qEnd).split("&", -1)
      val kept = new java.util.ArrayList[UTF8String](params.length)
      var i = 0
      while (i < params.length) {
        val p = params(i)
        if (p.nonEmpty && !p.startsWith("utm_") &&
          !p.startsWith("fbclid=") && !p.startsWith("gclid="))
          kept.add(UTF8String.fromString(p))
        i += 1
      }
      if (!kept.isEmpty) {
        java.util.Collections.sort(kept)
        sb.append('?')
        var k = 0
        while (k < kept.size()) {
          if (k > 0) sb.append('&')
          sb.append(kept.get(k).toString)
          k += 1
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `canonical_url(url)` — crawl-grade URL canonicalization, one parse. */
case class CanonicalUrl(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_url"
  override protected def nullSafeEval(input: Any): Any =
    CanonicalUrlKernel.canonicalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CanonicalUrlKernel.canonicalize($c)")
  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
}
