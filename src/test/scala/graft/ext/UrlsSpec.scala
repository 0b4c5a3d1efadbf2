package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, countDistinct}

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toSeq.toDF("url")
      .select(Urls.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("scheme/host case, www, default port, fragment") {
    assert(canon("HTTPS://WWW.Site.COM:443/A/b#frag") ===
      Seq("https://site.com/A/b"))
    // path case is preserved; only scheme+authority fold
    assert(canon("HtTp://Host.org:80/Path") === Seq("http://host.org/Path"))
    // a NON-default port survives
    assert(canon("https://h.com:80/x") === Seq("https://h.com:80/x"))
  }

  test("tracking params dropped, remainder sorted, empty query drops '?'") {
    assert(canon("https://h/x?utm_source=a&b=2&a=1&gclid=z&fbclid=q") ===
      Seq("https://h/x?a=1&b=2"))
    assert(canon("https://h/x?utm_campaign=only") === Seq("https://h/x"))
    // non-tracking param starting with 'utm' but not 'utm_' is kept
    assert(canon("https://h/x?utmost=1") === Seq("https://h/x?utmost=1"))
  }

  test("trailing slashes and root path") {
    assert(canon("https://h.com/a/b/") === Seq("https://h.com/a/b"))
    assert(canon("https://h.com/") === Seq("https://h.com"))
    assert(canon("https://h.com") === Seq("https://h.com"))
  }

  test("non-URLs pass through untouched") {
    assert(canon("no scheme here", "mailto:x@y.z is schemeless for ://") ===
      Seq("no scheme here", "mailto:x@y.z is schemeless for ://"))
  }

  test("idempotent: canonical of canonical is canonical") {
    val messy = Seq("HTTPS://WWW.Site.COM:443/A/?z=1&utm_x=9&a=2#f",
      "http://h:80/p/", "plain")
    val once = canon(messy: _*)
    assert(canon(once: _*) === once)
  }

  test("kernel == Column-chain spec on an adversarial URL battery") {
    val urls = Seq(
      // the planted-fixture shapes
      "HTTPS://WWW.src0.Example.COM:443/Docs/5/?utm_source=feed&z=9&a=1&gclid=x#sec",
      "http://src1.Example.COM:80/Docs/5?utm_source=feed&z=9&a=1&gclid=x&b=1#sec",
      "https://src2.Example.COM/Docs/36/?utm_source=feed&z=9&a=1&gclid=x",
      "Plain text, not a URL",
      // scheme validation edges
      "://nohost", "1http://h/x", "a:b://c", "ab+.-2://Host/Q",
      "HTTPS://h", "ftp://H:443/x",
      // authority edges: empty authority, bare www., odd ports
      "https:///path?a=1", "https://www./x", "https://h:8080/x",
      "http://WWW.H:80", "https://h:80/x", "http://h:443/x",
      // query/fragment edges: ? inside fragment, # before ?, empty params,
      // only-tracking queries, params needing a sort, trailing &
      "https://h/p#f?x=1", "https://h/p?#f", "https://h/p?&&",
      "https://h/p?utm_a=1&utm_b=2", "https://h/p?z=1&y=2&x=3&",
      "https://h/p?b=2&B=1&a=10&a=2", "https://h/p/?gclid=&fbclid=",
      // path edges: multiple trailing slashes, no path, root only
      "https://h.com////", "https://h.com", "https://h.com/?q=1",
      // case preservation in path/query, unicode host
      "HTTP://WWW.ÜBER.example/Straße/?Ä=ö&utm_x=1",
      "https://h/p?p=%20&q=a+b")
    val df = urls.toDF("url")
    val rows = df.select(
      Urls.canonicalUrl(col("url")).as("k"),
      Urls.canonicalUrlSpec(col("url")).as("s")).collect()
    urls.zip(rows).foreach { case (u, r) =>
      assert(r.getString(0) === r.getString(1), s"url='$u'")
    }
  }

  private def hostOf(urls: String*): Seq[String] =
    urls.toSeq.toDF("url")
      .select(Urls.urlHost(col("url")).as("h"))
      .collect().map(_.getString(0)).toSeq

  test("urlHost: lowercase, userinfo and port stripped, non-URL empty") {
    assert(hostOf("HTTPS://User:Pw@WWW.Site.COM:8443/a?b#c") ===
      Seq("www.site.com"))
    assert(hostOf("http://Host.ORG/x", "not a url", "https://h:443") ===
      Seq("host.org", "", "h"))
  }

  test("domain-keyed split: every host lands in exactly one split") {
    val docs = Seq(
      (1L, "https://a.example.com/x"), (2L, "https://a.example.com/y"),
      (3L, "http://b.example.com/z"), (4L, "https://a.example.com/w"),
      (5L, "not a url"), (6L, "plain text")
    ).toDF("doc_id", "url")
    val withHost = docs.select(col("doc_id"), Urls.urlHost(col("url")).as("host"))
    val split = graft.ops.Sampling.splitByMd5(withHost, col("host"),
      weights = Seq(0.8, 0.1, 0.1), names = Seq("train", "val", "test"))
    val perHost = split.groupBy("host")
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(perHost.forall(_.getLong(1) == 1L),
      "a host straddled two splits: leakage")
    // non-URLs share the '' host group -> one split together
    val emptyHost = split.filter(col("host") === "").select("split").distinct().count()
    assert(emptyHost === 1L)
  }

  test("hostSuffixes: host itself first, then every parent domain") {
    val sufs = Seq("a.b.example.com").toDF("h")
      .select(Urls.hostSuffixes(col("h")).as("s"))
      .collect().head.getSeq[String](0)
    assert(sufs === Seq("a.b.example.com", "b.example.com", "example.com", "com"))
  }

  test("blockedHosts: exact, parent-domain, multi-rule min; drop keeps the rest") {
    val df = Seq(
      (1L, "https://Bad.Example.com/x"),      // exact host rule
      (2L, "https://cdn.bad.example.com/y"),  // PARENT match only
      (3L, "https://deep.Evil.net/z"),        // parent + exact cdn-free rules
      (4L, "https://good.example.com/w"),     // clean
      (5L, "not a url")                       // host '' — never blocked
    ).toDF("id", "url")
    val block = Seq("bad.example.com", "evil.net", "deep.evil.net",
      "nosuch.org").toDF("domain")
    val m = Urls.blockedHosts(df, col("id"), col("url"), block)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "bad.example.com", 2L -> "bad.example.com",
      3L -> "deep.evil.net")) // min("deep.evil.net", "evil.net")
    val kept = Urls.dropBlockedHosts(df, col("id"), col("url"), block)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(kept === Seq(4L, 5L))
  }
}
