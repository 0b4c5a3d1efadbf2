package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Lowercased host of `url`: the authority with userinfo (`user@`) and
    * any `:port` stripped. Non-URLs (no `scheme://`) yield `''` — they can
    * never match a blocklist entry. Pure codegen regexp ops, fuses into
    * the scan.
    */
  def urlHost(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, AuthRe, 1)), "^[^@]*@", ""),
      ":[0-9]+$", "")

  /** [[urlHost]] as a DuckDB expression over a column named `url`. */
  val urlHostSql: String =
    """regexp_replace(regexp_replace(
      |  lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
      |  '^[^@]*@', ''), ':[0-9]+$', '')""".stripMargin

  /** Every dot-suffix of `host`, the host itself first: `a.b.example.com`
    * → `[a.b.example.com, b.example.com, example.com, com]`. The fan-out
    * is bounded by the label count (DNS caps names at 127 labels; real
    * hosts run < 10), which is what makes suffix-JOIN blocklist matching
    * linear — the naive form is a LIKE per list entry, O(corpus × list).
    */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /** UT1-style domain-blocklist matching — the URL-side filter crawl
    * pipelines (RefinedWeb/FineWeb shape) run before any text work: a URL
    * is blocked when its host or ANY parent domain appears in `blocklist`
    * (one lowercase `domain` column). Returns one row per BLOCKED id:
    * `(id, matched_domain)` with the bytewise-smallest matching rule when
    * several match (deterministic under any join order).
    *
    * Scale shape: only `(id, suffix)` pairs flow into the join — ≤ ~10 per
    * URL, never the document row — and the join is keyed on the suffix
    * string: Spark broadcasts a UT1-sized list (~MB) and falls back to a
    * shuffle join if the list is corpus-sized; either way no LIKE scan.
    */
  def blockedHosts(df: DataFrame, idCol: Column, urlCol: Column,
                   blocklist: DataFrame): DataFrame =
    df.select(idCol.as("id"), explode(hostSuffixes(urlHost(urlCol))).as("domain"))
      .join(blocklist.select(col("domain")).distinct(), Seq("domain"))
      .groupBy(col("id"))
      .agg(min(col("domain")).as("matched_domain"))

  /** The keep-side filter: `df` minus the rows [[blockedHosts]] flags —
    * an id-keyed LEFT ANTI join, so the surviving rows never shuffle when
    * the blocked-id side broadcasts (the common case: blocked ids are a
    * small fraction of the corpus).
    */
  def dropBlockedHosts(df: DataFrame, idCol: Column, urlCol: Column,
                       blocklist: DataFrame): DataFrame =
    df.join(blockedHosts(df, idCol, urlCol, blocklist)
        .select(col("id").as("__blocked_id")),
      idCol === col("__blocked_id"), "left_anti")

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
