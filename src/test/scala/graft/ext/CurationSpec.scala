package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CorpusDiff + Curation.lineage + ExactDedup.canonicalIds +
  * MinHashDedup.exactPairsMd5 — the corpus-versioning / curation-
  * observability family added in round 10.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- CorpusDiff -----------------------------------------------------

  test("diff classifies added/removed/changed and omits unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "C!"), (4L, null.asInstanceOf[String]), (5L, "e"))
      .toDF("doc_id", "text")
    val got = CorpusDiff.diff(v1, v2)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    // 1 removed, 2 unchanged (omitted), 3 changed, 4 NULL→NULL unchanged
    // (omitted), 5 added
    assert(got.toSeq === Seq((1L, "removed"), (3L, "changed"), (5L, "added")))
  }

  test("diff flags NULL→text and text→NULL as changed") {
    val v1 = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("doc_id", "text")
    val v2 = Seq((1L, "now set"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = CorpusDiff.diff(v1, v2)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq === Seq((1L, "changed"), (2L, "changed")))
  }

  test("sourceOverlap counts distinct shared texts per source pair, ordered") {
    val docs = Seq(
      (1L, "shared one", "a"), (2L, "shared one", "b"),   // a∩b
      (3L, "shared two", "a"), (4L, "shared two", "b"),   // a∩b again
      (5L, "shared one", "c"),                            // a∩c, b∩c via 'shared one'
      (6L, "a only", "a"), (7L, "b only", "b"),
      (8L, "shared one", "a"),                            // within-source dup: no double count
      (9L, null.asInstanceOf[String], "a"), (10L, null.asInstanceOf[String], "b")) // NULLs never overlap
      .toDF("doc_id", "text", "source")
    val got = CorpusDiff.sourceOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L))
  }

  // ---- ExactDedup.canonicalIds ---------------------------------------

  test("canonicalIds == groupBy(text) min over every row, nulls one group") {
    val docs = Seq(
      (10L, "dup"), (3L, "dup"), (7L, "dup"),
      (5L, "solo"),
      (8L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = ExactDedup.canonicalIds(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val naive = docs
      .withColumn("canonical_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("text")))
      .select("doc_id", "canonical_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === naive.toSeq)
    assert(got.length === docs.count())
  }

  // ---- Curation.lineage ----------------------------------------------

  test("lineage attributes the first dropping stage in pipeline order") {
    // 40 words, all distinct, 4 stopwords, mean word length ~5.4 — passes
    // every rule in the battery (score 4)
    val good = ((1 to 36).map(i => s"word$i") ++ Seq("the", "of", "and", "a")).mkString(" ")
    val docs = Seq(
      (1L, null.asInstanceOf[String]), // empty
      (2L, ""),                        // empty
      (3L, "short junk"),              // quality (< 20 words)
      (4L, good),                      // kept (canonical of the dup group)
      (5L, good),                      // dup of 4
      (6L, good + " unique tail"))     // kept
      .toDF("doc_id", "text")
    val got = Curation.lineage(docs, minScore = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "empty", 2L -> "empty", 3L -> "quality",
      4L -> "kept", 5L -> "dup", 6L -> "kept"))
  }

  test("lineage dedups over survivors only: dup of a quality-dropped doc is kept") {
    // doc 2 duplicates doc 1's text, but doc 1 never survives quality —
    // so doc 2 is NOT a duplicate within the surviving corpus
    val junk = "tiny"
    val docs = Seq((1L, junk), (2L, junk)).toDF("doc_id", "text")
    val got = Curation.lineage(docs, minScore = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "quality", 2L -> "quality"))
  }

  // ---- Curation.priorityKeep -----------------------------------------

  test("priorityKeep: lowest priority wins, id breaks ties, singletons self") {
    val docs = Seq(
      (1L, "page", 5), (2L, "page", 2), (3L, "page", 2), // 2 wins (p=2, min id)
      (4L, "solo", 9),                                    // self
      (5L, null.asInstanceOf[String], 3), (6L, null.asInstanceOf[String], 1)) // 6 wins
      .toDF("doc_id", "text", "priority")
    val got = Curation.priorityKeep(docs, "priority")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 4L, 5L -> 6L, 6L -> 6L))
  }

  test("priorityKeep differs from min-id exactly where priority inverts it") {
    val docs = Seq((1L, "x", 7), (9L, "x", 1)).toDF("doc_id", "text", "priority")
    val byPriority = Curation.priorityKeep(docs, "priority")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byPriority === Map(1L -> 9L, 9L -> 9L)) // min-id would keep 1
  }

  // ---- TextOps.piiCounts -----------------------------------------------

  test("piiCounts counts urls/emails/numbers independently, NULL -> NULL") {
    val docs = Seq(
      (1L, "call 555 or 911 mail a.b@c.org and x@y.io see https://e.org/p2"),
      (2L, "no pii here"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val counts = TextOps.piiCounts($"text")
    val got = docs.select($"doc_id" +: counts.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    // url https://e.org/p2 counts 1 url; its digit '2' + 555, 911, and the
    // digits in emails are ZERO (no digits in a.b@c.org/x@y.io) -> nums:
    // 555, 911, 2 (inside url) = 3
    assert(got(1L) === ((Some(1), Some(2), Some(3))))
    assert(got(2L) === ((Some(0), Some(0), Some(0))))
    assert(got(3L) === ((None, None, None)))
  }

  // ---- Curation.bestRepresentative -------------------------------------

  test("bestRepresentative: highest quality wins, min-id tiebreak, unlabeled ignored") {
    val labels = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 200L), (5L, 200L))
      .toDF("doc_id", "component")
    val quality = Seq((1L, 2), (2L, 4), (3L, 4), (4L, 1), (5L, 1), (9L, 9))
      .toDF("doc_id", "q") // 9 has no label: must not appear anywhere
    val got = Curation.bestRepresentative(labels, quality)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // comp 100: q=4 tie between 2 and 3 -> min id 2; comp 200: tie -> 4
    assert(got === Map(100L -> ((2L, 4L)), 200L -> ((4L, 1L))))
  }

  // ---- MinHash recall substrate --------------------------------------

  test("exactPairsMd5 == brute-force jaccard over the same shingle sets") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 25).map(i => s"w$i")
    val texts = (0L until 20L).map { id =>
      (id, Seq.fill(12 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = (texts ++ Seq((50L, texts(2)._2), (51L, texts(3)._2 + " zz")))
      .toDF("doc_id", "text")
    val sets = MinHashDedup.shingleSetsMd5(docs)
    val a = sets.select($"doc_id".as("doc_a"), $"shingles".as("sa"))
    val b = sets.select($"doc_id".as("doc_b"), $"shingles".as("sb"))
    val brute = a.crossJoin(b).filter($"doc_a" < $"doc_b")
      .withColumn("jaccard",
        size(array_intersect($"sa", $"sb")).cast("double") /
          size(array_union($"sa", $"sb")))
      .filter($"jaccard" >= 0.3)
      .select("doc_a", "doc_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val keyed = MinHashDedup.exactPairsMd5(docs, minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(brute.nonEmpty) // planted exact copy must appear
    assert(keyed.toSeq === brute.toSeq)
  }

  test("banded minhash pairs are a subset of exact truth (precision 1)") {
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 20).map(i => s"w$i")
    val texts = (0L until 15L).map { id =>
      (id, Seq.fill(10 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = (texts ++ Seq((90L, texts(0)._2))).toDF("doc_id", "text")
    val truth = MinHashDedup.exactPairsMd5(docs, minJaccard = 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = MinHashDedup.nearDuplicatesMd5(docs, minJaccard = 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(truth))
    assert(found.contains((0L, 90L))) // the exact copy always collides
  }
}
