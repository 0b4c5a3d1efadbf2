package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization every web-crawl pipeline runs
  * before URL-level dedup (two crawls of `HTTPS://WWW.Site.com:443/a/?b=2&a=1`
  * and `https://site.com/a?a=1&b=2` are the same page). The rule set is the
  * common core of crawler canonicalizers (scheme/host case, default ports,
  * `www.` prefix, fragment, tracking params, param order, trailing slash),
  * chosen so every step is a codegen regexp/array op that fuses into the
  * scan — a pure map pass, mirrored verbatim in the DuckDB oracle.
  *
  * Rules, in order (each documented because the ORDER is the contract):
  *  1. no `scheme://` prefix → returned untouched (not a URL; never guess);
  *  2. scheme and authority lowercased (RFC 3986 §6.2.2.1 — case-insensitive
  *     components; path/query case is MEANINGFUL and preserved);
  *  3. leading `www.` dropped from the host;
  *  4. default port stripped (`:443` for https, `:80` for http — only the
  *     scheme's own default; `https://h:80` keeps its odd port);
  *  5. fragment dropped (client-side only, never reaches the server);
  *  6. tracking params dropped: `utm_*`, `fbclid=…`, `gclid=…`;
  *  7. remaining query params sorted bytewise (param order is
  *     server-insignificant in practice; sorting makes equal param SETS
  *     compare equal) and re-joined; an emptied query drops its `?`;
  *  8. trailing `/`s stripped from the path (`/a/` ≡ `/a`; a root path
  *     becomes empty — `https://h/` ≡ `https://h`).
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"

  /** Canonical form of `url` per the rules above; non-URLs pass through.
    * Backed by the one-pass [[graft.functions.CanonicalUrl]] kernel — the
    * Column chain in [[canonicalUrlSpec]] is the executable spec (≈15
    * regex passes per row, and inlining it duplicates its input subtree
    * into every pass); the kernel is pinned value-identical to it in
    * `UrlsSpec`.
    */
  def canonicalUrl(url: Column): Column =
    graft.functions.GraftFunctions.canonical_url(url)

  /** The rule set as a Column chain — the spec the DuckDB mirror below
    * transcribes and the kernel is pinned against.
    */
  def canonicalUrlSpec(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val auth0 = regexp_replace(lower(regexp_extract(url, AuthRe, 1)), "^www\\.", "")
    val auth = when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .otherwise(auth0)
    val path = regexp_replace(regexp_extract(url, PathRe, 1), "/+$", "")
    val kept = array_sort(filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => length(p) > 0 && substring(p, 1, 4) =!= "utm_" &&
        !p.rlike("^(fbclid|gclid)=")))
    when(scheme === "", url).otherwise(concat(
      scheme, lit("://"), auth, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit(""))))
  }

  /** The same rule set as a DuckDB SQL expression over a column named
    * `url` — kept adjacent to [[canonicalUrl]] so the two rule lists can
    * only drift in review, not silently.
    */
  val canonicalUrlSql: String =
    """CASE WHEN regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = '' THEN url
      |ELSE concat(
      |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)), '://',
      |  CASE lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      |    WHEN 'https' THEN regexp_replace(regexp_replace(
      |      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
      |      '^www\.', ''), ':443$', '')
      |    WHEN 'http' THEN regexp_replace(regexp_replace(
      |      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
      |      '^www\.', ''), ':80$', '')
      |    ELSE regexp_replace(
      |      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
      |      '^www\.', '') END,
      |  regexp_replace(
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
      |    '/+$', ''),
      |  CASE WHEN len(list_filter(string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
      |      p -> len(p) > 0 AND substr(p, 1, 4) <> 'utm_'
      |        AND NOT regexp_matches(p, '^(fbclid|gclid)='))) > 0
      |    THEN concat('?', array_to_string(list_sort(
      |      list_filter(string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
      |        p -> len(p) > 0 AND substr(p, 1, 4) <> 'utm_'
      |          AND NOT regexp_matches(p, '^(fbclid|gclid)='))), '&'))
      |    ELSE '' END)
      |END""".stripMargin
}
