package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.UnigramLm

/** Unigram-LM (SentencePiece-style) tokenizer registry entries — the
  * tokenizer family's second member beside the BPE entries in
  * [[Extensions]] (Kudo 2018; see [[graft.ext.UnigramLm]] for the
  * algorithm and determinism contract).
  *
  * Oracle strategy (the trained-centroid pattern + the BPE unroll): piece
  * SCORES are frozen driver-side literals (the one transcendental — ln —
  * never crosses engines), and DuckDB re-runs every E-step as an unrolled
  * integer Viterbi DP over those literals: d_i = best (score, mask) over
  * the first i characters, maximized by score with the smaller boundary
  * mask breaking ties (prefix-monotone, so per-prefix maximization is
  * exact). Training counts, pruning, and tokenization are then fully
  * hash-matched cross-engine; the seed stage is pure counting and gets a
  * static oracle with no literals at all.
  */
object TokenizerQueries {

  type Q = (SparkSession, String) => DataFrame

  private val MaxPieceLen = 4
  private val SeedSize = 120
  private val EmRounds = 2
  // DP position unroll in the oracle SQL — and the MODEL's word-length
  // cap: passed to UnigramLm.train/tokenize as maxWordLen so the engine
  // and its oracle share ONE bound (round-11 ADVICE — previously a 17-63
  // code-point word trained fine in Spark but produced no DP row in the
  // oracle). An over-long word now fails loudly where the data enters
  // instead of hash-mismatching. Fixture max word length is 8.
  private val DpUnroll = 16

  /** Trained model per corpus — train-once state like the BPE merge list
    * (bounded: ≤ seedSize + alphabet pieces per round).
    */
  private val unigramCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), UnigramLm.UnigramModel]

  private def unigramFor(s: SparkSession, dir: String): UnigramLm.UnigramModel =
    unigramCache.getOrElseUpdate((s.sparkContext.applicationId, dir),
      graft.BuildTimes.timed("unigram_train") {
        UnigramLm.train(Tables.documents(s, dir), "text",
          emRounds = EmRounds, maxPieceLen = MaxPieceLen, seedSize = SeedSize,
          maxWordLen = DpUnroll)
      })

  val queries: Map[String, Q] = Map(

    // seed piece table: overlapping substring counts over the word vocab,
    // singles ∪ top-N selection — one vocab-sized aggregation + global
    // top-k, statically oracled (no trained literals)
    "x_unigram_seed" -> ((s: SparkSession, dir: String) => {
      UnigramLm.seedPieces(Tables.documents(s, dir), "text",
        MaxPieceLen, SeedSize)
    }),

    // the trained model itself, one row per (round, piece): counts are
    // re-derived by the oracle's unrolled Viterbi DP + recount + prune
    // over the PREVIOUS round's frozen scores, so every EM round's E and
    // M steps are hash-matched; scores ride as frozen literals
    "x_unigram_train" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val m = unigramFor(s, dir)
      (1 to EmRounds).flatMap { r =>
        m.rounds(r).map { case (p, c, sc) => (r, p, c, sc) }
      }.toDF("round", "piece", "cnt", "score")
    }),

    // corpus tokenization with the final model: per doc word count, piece
    // count, and the first word's segmentation (the Bpe.tokenize shape);
    // the oracle re-segments the distinct-word vocabulary in SQL and
    // joins it back through each document's word list
    "x_unigram_tokenize" -> ((s: SparkSession, dir: String) => {
      UnigramLm.tokenize(Tables.documents(s, dir), "doc_id", "text",
        unigramFor(s, dir).finalScores, MaxPieceLen, maxWordLen = DpUnroll)
    })
  )

  // ---- oracle SQL -------------------------------------------------------

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Word-frequency + singles CTEs shared by all three oracles (verbatim
    * Bpe.wordFreq / UnigramLm.seedPieces semantics).
    */
  private val wordCtes =
    s"""w AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY word),
       |sub AS (SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece, freq
       |  FROM w, generate_series(1, ${UnigramLm.MaxWordLen}) t(i),
       |       generate_series(1, $MaxPieceLen) u(l)
       |  WHERE i <= length(word) AND i + l - 1 <= length(word)),
       |scnt AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
       |         FROM sub GROUP BY piece),
       |sing AS (SELECT piece FROM scnt WHERE length(piece) = 1)""".stripMargin

  private val seedSelect =
    s"""SELECT piece, cnt FROM (
       |  SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
       |  FROM scnt) WHERE rk <= $SeedSize
       |UNION
       |SELECT s.piece, c.cnt FROM sing s JOIN scnt c USING (piece)""".stripMargin

  /** VALUES literal of a round's frozen (piece, score) pairs. */
  private def piecesLiteral(name: String, ps: Seq[(String, Long, Long)]): String =
    s"""$name AS (SELECT * FROM (VALUES
       |      ${ps.sortBy(_._1).map { case (p, _, sc) =>
            s"(${sqlStr(p)}, CAST($sc AS BIGINT))" }.mkString(",\n      ")}
       |    ) t(p, s))""".stripMargin

  /** Unrolled Viterbi DP over a words CTE `uw(word)` against a pieces CTE
    * `(p, s)`: d_i holds the best (score, mask) covering the first i
    * characters — max by score, ties to the SMALLER mask (encoded as
    * max(struct(sc, -mask))). Emits `<tag>best(word, sc, msk)` plus
    * `<tag>ps(word, ps)` — the segmentation recovered from the mask.
    */
  private def dpCtes(tag: String, piecesCte: String): String = {
    val d0 = s"${tag}0 AS (SELECT word, CAST(0 AS BIGINT) AS sc, " +
      s"CAST(0 AS BIGINT) AS msk FROM uw)"
    val dis = (1 to DpUnroll).map { i =>
      val branches = (math.max(0, i - MaxPieceLen) until i).map { j =>
        s"""SELECT d.word, d.sc + p.s AS csc,
           |        d.msk + (CAST(1 AS BIGINT) << ${i - 1}) AS cmsk
           |      FROM ${tag}$j d JOIN $piecesCte p
           |        ON p.p = substr(d.word, ${j + 1}, ${i - j})
           |      WHERE length(d.word) >= $i""".stripMargin
      }.mkString("\n      UNION ALL ")
      s"""${tag}$i AS MATERIALIZED (
         |  SELECT word, struct_extract(b, 'sc') AS sc,
         |         -struct_extract(b, 'ngm') AS msk
         |  FROM (SELECT word, max(struct_pack(sc := csc, ngm := -cmsk)) AS b
         |        FROM ($branches) GROUP BY word))""".stripMargin
    }
    val best = s"""${tag}best AS (${(1 to DpUnroll)
      .map(i => s"SELECT word, sc, msk FROM ${tag}$i WHERE length(word) = $i")
      .mkString("\n  UNION ALL ")})"""
    val seg =
      s"""${tag}seg AS (SELECT word, msk,
         |    list_filter(generate_series(1, length(word)),
         |                e -> ((msk >> (e - 1)) & 1) = 1) AS ends
         |  FROM ${tag}best),
         |${tag}ps AS (SELECT word,
         |    list_transform(generate_series(1, len(ends)), k ->
         |      substr(word,
         |        CASE WHEN k = 1 THEN 1 ELSE CAST(ends[k - 1] + 1 AS INT) END,
         |        CAST(ends[k] - CASE WHEN k = 1 THEN 0 ELSE ends[k - 1] END AS INT))) AS ps
         |  FROM ${tag}seg)""".stripMargin
    (Seq(d0) ++ dis ++ Seq(best, seg)).mkString(",\n")
  }

  /** Per-round E+M mirror: DP with round r−1's literals, recount
    * (freq-weighted, per occurrence), prune to top-N ∪ singles.
    */
  private def roundCtes(r: Int, prev: Seq[(String, Long, Long)]): String = {
    val tag = s"r${r}d"
    s"""${piecesLiteral(s"pc$r", prev)},
       |${dpCtes(tag, s"pc$r")},
       |cnt$r AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT w.freq, unnest(p.ps) AS piece
       |        FROM ${tag}ps p JOIN w USING (word))
       |  GROUP BY piece),
       |sel$r AS (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
       |    FROM cnt$r) WHERE rk <= $SeedSize
       |  UNION
       |  SELECT s.piece, coalesce(c.cnt, CAST(0 AS BIGINT)) AS cnt
       |  FROM sing s LEFT JOIN cnt$r c USING (piece))""".stripMargin
  }

  private def trainOracle(m: UnigramLm.UnigramModel): String = {
    val rounds = (1 to EmRounds).map { r =>
      roundCtes(r, m.rounds(r - 1)) + ",\n" +
        piecesLiteral(s"ps$r", m.rounds(r))
    }.mkString(",\n")
    val out = (1 to EmRounds).map { r =>
      s"""SELECT CAST($r AS INT) AS round, sel$r.piece, sel$r.cnt, ps$r.s AS score
         |FROM sel$r JOIN ps$r ON ps$r.p = sel$r.piece""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH $wordCtes,
       |uw AS (SELECT word FROM w),
       |$rounds
       |$out""".stripMargin
  }

  private def tokenizeOracle(m: UnigramLm.UnigramModel): String = {
    val tag = "td"
    s"""WITH dw AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
       |  FROM documents),
       |uw AS (SELECT DISTINCT unnest(ws) AS word FROM dw),
       |${piecesLiteral("pcf", m.finalPieces)},
       |${dpCtes(tag, "pcf")},
       |wp AS (SELECT word, ps, CAST(len(ps) AS INT) AS np FROM ${tag}ps),
       |occ AS (SELECT doc_id, unnest(ws) AS word FROM dw),
       |agg AS (SELECT o.doc_id, CAST(count(*) AS INT) AS n_words,
       |    CAST(sum(wp.np) AS INT) AS n_pieces
       |  FROM occ o JOIN wp USING (word) GROUP BY o.doc_id),
       |fw AS (SELECT f.doc_id, array_to_string(wp.ps, '|') AS first_word_pieces
       |  FROM (SELECT doc_id, ws[1] AS word FROM dw WHERE len(ws) >= 1) f
       |  JOIN wp USING (word))
       |SELECT d.doc_id,
       |  coalesce(agg.n_words, 0) AS n_words,
       |  coalesce(agg.n_pieces, 0) AS n_pieces,
       |  coalesce(fw.first_word_pieces, '') AS first_word_pieces
       |FROM documents d
       |LEFT JOIN agg USING (doc_id) LEFT JOIN fw USING (doc_id)""".stripMargin
  }

  /** Seed oracle is static; train/tokenize need the frozen literals, so
    * they exist only after the matching queries trained the model (the
    * ivfOracles mechanics — Verify dumps oracle_sql.json after running).
    */
  def oracleSql: Map[String, String] = {
    val base = Map("x_unigram_seed" -> s"WITH $wordCtes\n$seedSelect")
    unigramCache.toMap match {
      case one if one.size == 1 =>
        val m = one.head._2
        base + ("x_unigram_train" -> trainOracle(m),
          "x_unigram_tokenize" -> tokenizeOracle(m))
      case _ => base
    }
  }

  // bench rebuild hook (see graft.BuildRebuild)
  graft.BuildRebuild.register("unigram_train") { (s, dir) =>
    unigramCache.remove((s.sparkContext.applicationId, dir)): Unit
    unigramFor(s, dir): Unit
  }
}
