package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup stripping — the extraction step between "crawled bytes" and
  * every text operator in this engine (the trafilatura/jusText niche,
  * reduced to the deterministic core that needs no DOM): drop the
  * non-content machinery, decode the entities browsers render, normalize
  * whitespace. A pure columnar regexp/replace chain (RE2-compatible
  * patterns, the [[TextOps.scrub]] discipline) that fuses into the scan —
  * and mirrors verbatim in DuckDB, so the CLEANED TEXT itself is
  * oracle-compared, not just counts.
  *
  * Rules, in order (the order IS the contract):
  *  1. `<script>`/`<style>` blocks removed WITH their content (code and
  *     CSS are not text; case-insensitive, non-greedy, dot-matches-newline);
  *  2. HTML comments `<!-- … -->` removed with content;
  *  3. every remaining tag `<…>` becomes one space (block/inline
  *     distinction is layout, not content — whitespace collapse below
  *     makes them equivalent anyway);
  *  4. the five entities browsers decode most (`&lt; &gt; &quot; &#39;
  *     &nbsp;`) are replaced, then `&amp;` LAST — decoding it first would
  *     double-decode `&amp;lt;` into `<`;
  *  5. whitespace runs collapse to one space, ends trimmed (the explicit
  *     class `[ \t\n\r\f]` — Java's `\s` and RE2's disagree on `\v`).
  */
object Markup {

  /** `(pattern → replacement)` regexp pass, then the entity replaces. */
  private val TagPasses: Seq[(String, String)] = Seq(
    "(?is)<(script|style)[^>]*>.*?</(script|style)>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    // a tag OPENS with a letter, '/', or '!' (HTML5 tag-open rule): a lone
    // '<' in prose ("1 < 2") is text, not markup, and must survive
    "<[!/]?[A-Za-z][^>]*>" -> " ")

  private val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Visible text of a markup column per the rules above. */
  def stripMarkup(html: Column): Column = {
    val untagged = TagPasses.foldLeft(html) { case (c, (re, repl)) =>
      regexp_replace(c, re, repl)
    }
    val decoded = Entities.foldLeft(untagged) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, "[ \t\n\r\f]+", " "))
  }

  /** The same rule chain as a DuckDB expression over a column named
    * `html` — adjacent to [[stripMarkup]] so drift is a review diff.
    */
  val stripMarkupSql: String = {
    val untagged = TagPasses.foldLeft("html") { case (acc, (re, repl)) =>
      // 'g': DuckDB regexp_replace replaces only the FIRST match unless
      // told otherwise; Spark's always replaces all
      s"regexp_replace($acc, '${re.replace("\\", "\\\\")}', '$repl', 'g')"
    }
    val decoded = Seq(
      ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
      ("&#39;", "''"), ("&nbsp;", " "), ("&amp;", "&"))
      .foldLeft(untagged) { case (acc, (from, to)) =>
        s"replace($acc, '$from', '$to')"
      }
    s"trim(regexp_replace($decoded, '[ \\t\\n\\r\\f]+', ' ', 'g'))"
  }
}
