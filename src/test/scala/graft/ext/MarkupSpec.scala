package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class MarkupSpec extends SparkSpec {
  import spark.implicits._

  private def strip(htmls: String*): Seq[String] =
    htmls.toSeq.toDF("h")
      .select(Markup.stripMarkup(col("h")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("script/style drop their CONTENT; other tags drop only the markup") {
    assert(strip("<p>keep</p><script>var x = '<gone>';</script><style>p{}</style>ok") ===
      Seq("keep ok"))
    // case-insensitive, attributes, multi-line bodies
    assert(strip("<SCRIPT type=\"a\">line1\nline2 < 3 && true</SCRIPT>text") ===
      Seq("text"))
  }

  test("comments removed with content, even multi-line") {
    assert(strip("a<!-- hidden\n<p>not text</p> -->b") === Seq("a b"))
  }

  test("entity decode order: &amp; last, so &amp;lt; surfaces as &lt;") {
    assert(strip("T&amp;C &lt;x&gt; &quot;q&quot; &#39;s&#39;&nbsp;end") ===
      Seq("T&C <x> \"q\" 's' end"))
    assert(strip("&amp;lt;escaped&amp;gt;") === Seq("&lt;escaped&gt;"))
    // entities outside the decode set pass through raw
    assert(strip("&copy; 2024") === Seq("&copy; 2024"))
  }

  test("whitespace runs collapse, ends trim; tag-adjacent words stay split") {
    assert(strip("  a \t\n b\n<br><br>c ") === Seq("a b c"))
    assert(strip("x<br>y") === Seq("x y"))
  }

  test("plain text with a lone '<' that opens no tag is preserved") {
    assert(strip("1 < 2 and 3 > 2") === Seq("1 < 2 and 3 > 2"))
  }
}
