package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("byEditDistance: matches within maxDist inside a block; cross-block pairs unseen") {
    val l = Seq((1L, "kitten"), (2L, "flaw"), (3L, "zebra")).toDF("lid", "name")
    val r = Seq((10L, "sitting"), (11L, "lawn"), (12L, "zebra"), (13L, "kitten!"))
      .toDF("rid", "rname")
    // block everything together: pure verify semantics
    val got = FuzzyJoin.byEditDistance(l, r, "name", "rname",
        lit(1), lit(1), maxDist = 3)
      .select("lid", "rid", "dist").as[(Long, Long, Int)].collect().toSet
    // kitten->sitting = 3, kitten->kitten! = 1, flaw->lawn = 2, zebra->zebra = 0
    assert(got === Set((1L, 10L, 3), (1L, 13L, 1), (2L, 11L, 2), (3L, 12L, 0)))
  }

  test("byEditDistance: blocking bounds candidates — a cross-block true match is missed by design") {
    val l = Seq((1L, "abc")).toDF("lid", "name")
    val r = Seq((10L, "abd")).toDF("rid", "rname")
    val hit = FuzzyJoin.byEditDistance(l, r, "name", "rname",
      substring(col("name"), 1, 1), substring(col("rname"), 1, 1), 1)
    assert(hit.count() === 1L)
    val miss = FuzzyJoin.byEditDistance(l, r, "name", "rname",
      substring(col("name"), 3, 1), substring(col("rname"), 3, 1), 1)
    assert(miss.count() === 0L) // the edit changed the block key: recall is the blocker's
  }

  test("byEditDistance: length prefilter never drops a true ≤k pair (spot equivalence)") {
    val words = Seq("alpha", "alphas", "alpah", "beta", "betta", "bet", "gamma")
    val l = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("lid", "name")
    val r = words.zipWithIndex.map { case (w, i) => (i.toLong + 100, w.reverse.reverse) }
      .toDF("rid", "rname")
    val blocked = FuzzyJoin.byEditDistance(l, r, "name", "rname", lit(1), lit(1), 2)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = (for {
      (a, i) <- words.zipWithIndex
      (b, j) <- words.zipWithIndex
      if levenshteinRef(a, b) <= 2
    } yield (i.toLong, j.toLong + 100)).toSet
    assert(blocked === naive)
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
