package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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
}
