package graft.ext

import graft.SparkSpec

/** Exact-substring duplication: planted cross-doc passage recovery with
  * exact span boundaries, within-doc repeats, the keep-first cut policy,
  * island merging, and short-doc/zero-dup edges.
  */
class SubstrDedupSpec extends SparkSpec {
  import spark.implicits._

  // Docs 1 and 2 share a 20-char passage at different offsets; doc 3
  // repeats a 12-char string twice internally; doc 4 is unique filler;
  // doc 5 is shorter than k. Filler alphabets are disjoint so nothing
  // else duplicates by accident.
  private val shared = "AAAAABBBBBCCCCCDDDDD" // 20 chars
  private def docs = Seq(
    (1L, "xxxxxxxxxx" + shared + "yyyyyyyyyy"),        // shared at pos 10
    (2L, shared + "abcdefghijklmnopqrst"),             // shared at pos 0
    (3L, "REPEATREPEAT" + "qqqqqq" + "REPEATREPEAT"),  // 12-char x2, pos 0 and 18
    (4L, "uniquefillerwithoutanyrepeatedcontent!"),
    (5L, "tiny")
  ).toDF("doc_id", "text")

  test("dupSpans: planted cross-doc passage recovered with exact boundaries") {
    val got = SubstrDedup.dupSpans(docs, k = 10)
      .select("doc_id", "span_start", "span_end", "span_len")
      .as[(Long, Long, Long, Long)].collect().toSet
    // k=10 windows duplicated exactly where the window lies inside the
    // shared 20 chars → one maximal span per copy, len 20
    assert(got.contains((1L, 10L, 30L, 20L)))
    assert(got.contains((2L, 0L, 20L, 20L)))
    // doc 3: both 12-char copies report spans of len 12
    assert(got.contains((3L, 0L, 12L, 12L)))
    assert(got.contains((3L, 18L, 30L, 12L)))
    // nothing in the unique or short docs
    assert(got.map(_._1) === Set(1L, 2L, 3L))
  }

  test("cutSpans keeps the corpus-first copy by (id, pos); later copies are cut") {
    val got = SubstrDedup.cutSpans(docs, k = 10)
      .select("doc_id", "span_start", "span_end", "span_len")
      .as[(Long, Long, Long, Long)].collect().toSet
    // shared passage: first occurrence by (id, pos) is doc 1 pos 10 →
    // doc 1 survives, doc 2's copy is cut
    assert(got.contains((2L, 0L, 20L, 20L)))
    assert(!got.exists(s => s._1 == 1L))
    // within-doc repeat: first copy (pos 0) survives, second is cut
    assert(got.contains((3L, 18L, 30L, 12L)))
    assert(!got.contains((3L, 0L, 12L, 12L)))
  }

  test("dupStats: every doc reports; fractions are exact integer divisions") {
    val got = SubstrDedup.dupStats(docs, k = 10)
      .select("doc_id", "n_chars", "dup_chars", "dup_fraction")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(got(1L) === ((40L, 20L, 0.5)))
    assert(got(2L) === ((40L, 20L, 0.5)))
    assert(got(3L) === ((30L, 24L, 0.8)))
    assert(got(4L)._2 === 0L && got(4L)._3 === 0.0)
    assert(got(5L) === ((4L, 0L, 0.0))) // shorter than k: no windows, zero dup
  }

  test("cleanText: cut spans excised, survivors stitched, untouched docs verbatim") {
    val occ = SubstrDedup.dupOccurrences(docs, k = 10)
    val got = SubstrDedup.cleanText(docs, occ, k = 10)
      .select("doc_id", "clean_text", "n_cut", "cut_chars")
      .as[(Long, String, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1 holds the first copy — untouched
    assert(got(1L) === (("xxxxxxxxxx" + shared + "yyyyyyyyyy", 0, 0L)))
    // doc 2's copy is cut; its unique filler survives
    assert(got(2L) === (("abcdefghijklmnopqrst", 1, 20L)))
    // doc 3: second internal copy cut, first kept
    assert(got(3L) === (("REPEATREPEATqqqqqq", 1, 12L)))
    // unique and short docs pass through verbatim
    assert(got(4L)._1 === "uniquefillerwithoutanyrepeatedcontent!")
    assert(got(5L) === (("tiny", 0, 0L)))
  }

  test("islands merge: overlapping duplicated windows form ONE maximal span") {
    // 25-char shared passage, k=10 → 16 consecutive duplicated positions
    // per copy, exactly one span each — never 16 spanlets
    val p = "MMMMMNNNNNOOOOOPPPPPQQQQQ"
    val two = Seq((1L, "aaaaaaa" + p), (2L, p + "bbbbbbb")).toDF("doc_id", "text")
    val spans = SubstrDedup.dupSpans(two, k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(spans.length === 2)
    assert(spans.forall(_._4 == 25L))
  }

  test("overlapping islands merge: two dup passages < k apart form ONE disjoint span") {
    // Doc 9 carries two duplicated stretches whose covered intervals
    // OVERLAP: windows 0..2 (first 12 chars, shared with doc 1) and
    // window 8 (chars 8..18, shared with doc 2), with unique windows
    // 3..7 between them. Separate islands would be [0,12) and [8,18) —
    // overlapping, summing to 22 dup chars in a 20-char doc
    // (dup_fraction > 1) and breaking cleanText's segment arithmetic.
    // The gap-based grouping (8 - 2 = 6 < k) must merge them into the
    // single union span [0,18).
    val a = "abcdefghijklmnopqrst" // 20 distinct chars
    val three = Seq(
      (1L, a.substring(0, 12) + "123456"),  // holds windows 0..2 of doc 9
      (2L, a.substring(8, 18) + "!@#$%^"),  // holds window 8 of doc 9
      (9L, a)
    ).toDF("doc_id", "text")
    val spans = SubstrDedup.dupSpans(three, k = 10)
      .filter($"doc_id" === 9L)
      .select("span_start", "span_end", "span_len")
      .as[(Long, Long, Long)].collect().toSet
    assert(spans === Set((0L, 18L, 18L)), "must be ONE merged span, not two overlapping")
    val st = SubstrDedup.dupStats(three, k = 10)
      .filter($"doc_id" === 9L)
      .select("n_chars", "dup_chars", "dup_fraction")
      .as[(Long, Long, Double)].collect().head
    assert(st === ((20L, 18L, 0.9)), "dup_chars must count the union, never exceed n_chars")
    // doc 9's copies are the LATER occurrences (ids 1 and 2 hold the
    // firsts), so the merged span is also the cut span — the clean text
    // must be the exact complement, with non-negative segment lengths
    val occ = SubstrDedup.dupOccurrences(three, k = 10)
    val clean = SubstrDedup.cleanText(three, occ, k = 10)
      .select("doc_id", "clean_text", "n_cut", "cut_chars")
      .as[(Long, String, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(clean(9L) === (("st", 1, 18L)))
    assert(clean(1L) === ((a.substring(0, 12) + "123456", 0, 0L)), "first copies survive")
    assert(clean(2L) === ((a.substring(8, 18) + "!@#$%^", 0, 0L)))
  }

  test("two-pass hash-first occurrences == naive string-only groupBy") {
    import org.apache.spark.sql.functions._
    val k = 10
    // naive form: no hash pass — group every window by its text directly
    val w = docs.filter(length(col("text")) >= k)
      .select(col("doc_id").as("id"),
        explode(sequence(lit(0L), (length(col("text")) - k).cast("long"))).as("pos"),
        col("text"))
      .select(col("id"), col("pos"),
        col("text").substr(col("pos").cast("int") + 1, lit(k)).as("gram"))
    val dup = w.groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"), min(struct(col("id"), col("pos"))).as("first"))
      .filter(col("cnt") >= 2)
    val naive = w.join(dup, Seq("gram"))
      .select(col("id"), col("pos"),
        (col("first.id") === col("id") && col("first.pos") === col("pos")).as("is_first"))
      .as[(Long, Long, Boolean)].collect().toSet
    val got = SubstrDedup.dupOccurrences(docs, k = k)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === naive)
  }

  test("no duplicated content → empty spans, zeroed stats") {
    val uniq = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (2L, "ZYXWVUTSRQPONMLKJIHGFEDCBA!@#$%^&*()")).toDF("doc_id", "text")
    assert(SubstrDedup.dupSpans(uniq, k = 10).count() === 0L)
    val st = SubstrDedup.dupStats(uniq, k = 10)
      .select("dup_chars").as[Long].collect()
    assert(st.toSeq === Seq(0L, 0L))
  }
}
