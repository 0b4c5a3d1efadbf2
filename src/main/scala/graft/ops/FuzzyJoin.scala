package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (approximate) string join — the record-linkage primitive ETL
  * pipelines use to match dirty identifiers (names, addresses, SKUs)
  * across sources: pairs within `maxDist` Levenshtein edits.
  *
  * An exact edit-distance join is inherently all-pairs, so the scale
  * design is BLOCKING + verify (the standard record-linkage shape, same
  * candidate-generation discipline as the Jaccard prefix filter): an
  * equi-join on caller-chosen block keys bounds candidates to within-block
  * pairs, then a cheap length prefilter (|len(a)−len(b)| ≤ k is implied by
  * edit distance ≤ k — triangle inequality on insertions/deletions) and
  * the exact `levenshtein` verify run INSIDE the block join. Recall is
  * exactly the blocking function's: a pair whose edits change the block
  * key is missed, so callers block on fields the expected corruption
  * can't touch (stable substrings, phonetic codes, sorted token prefixes).
  * Both engines implement textbook Levenshtein, so the verified output is
  * SQL-oracle-checkable.
  */
object FuzzyJoin {

  /** (left ⋈ right) with `dist` = levenshtein(leftCol, rightCol) ≤ maxDist,
    * candidates bounded by `blockL = blockR`.
    */
  def byEditDistance(left: DataFrame, right: DataFrame,
                     leftCol: String, rightCol: String,
                     blockL: Column, blockR: Column,
                     maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"byEditDistance: maxDist >= 0, got $maxDist")
    // withColumn would silently REPLACE caller columns of these names
    // (the original data vanishes via the final drop, or is shadowed by
    // the levenshtein output) — fail loudly instead
    Seq("__blk", "dist").foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"byEditDistance: input already has a '$c' column — rename it first")
    }
    val l = left.withColumn("__blk", blockL)
    val r = right.withColumn("__blk", blockR)
    l.join(r, Seq("__blk"))
      // length prefilter before the DP — free pruning in-block
      .filter(abs(length(col(leftCol)) - length(col(rightCol))) <= maxDist)
      // threshold form: the banded O(k·len) DP that abandons a pair the
      // moment its band exceeds maxDist (returns -1), instead of the full
      // O(len²) table — the distance returned for surviving pairs is the
      // exact one, so the output contract is unchanged
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol), maxDist))
      .filter(col("dist") =!= -1)
      .drop("__blk")
  }
}
