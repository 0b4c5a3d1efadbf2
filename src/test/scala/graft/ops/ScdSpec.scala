package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String)]) =
    Scd.type2(rows.toDF("user_id", "sec", "event_id", "status"),
        keyCol = "user_id", stateCol = "status",
        orderCols = Seq(col("sec"), col("event_id")),
        fromCol = col("sec").cast("string"))
      .as[(Long, String, String, Option[String], Int)]
      .collect().sortBy(r => (r._1, r._3.toLong)).toSeq

  test("type2: same-state runs collapse; valid_to chains; last run is current") {
    // user 1: A A B A  -> runs A[10,30) B[30,40) A[40,∞)
    // user 2: X        -> one open run
    val got = run(Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"), (2L, 10L, 5L, "X")))
    assert(got === Seq(
      (1L, "A", "10", Some("30"), 0),
      (1L, "B", "30", Some("40"), 0),
      (1L, "A", "40", None, 1),
      (2L, "X", "10", None, 1)))
  }

  test("type2: ties on the order value break by the id column, not arbitrarily") {
    // two events in the same second: event_id 2 ("B") sorts after 1 ("A"),
    // so the runs are A[10,10) then B — deterministic despite the tie
    val got = run(Seq((1L, 10L, 1L, "A"), (1L, 10L, 2L, "B")))
    assert(got.map(r => (r._2, r._3, r._4, r._5)) ===
      Seq(("A", "10", Some("10"), 0), ("B", "10", None, 1)))
  }

  test("type2 == driver-side reference on random histories (sampled property)") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val rows = (1 to 200).map { i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, i.toLong,
          ("ABC")(rnd.nextInt(3)).toString)
      }
      val got = run(rows).toSet
      // reference: sort per key, collapse runs sequentially
      val want = rows.groupBy(_._1).flatMap { case (uid, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._3))
        val runs = sorted.foldLeft(Vector.empty[(String, Long)]) { (acc, e) =>
          if (acc.nonEmpty && acc.last._1 == e._4) acc
          else acc :+ (e._4, e._2)
        }
        runs.zipWithIndex.map { case ((st, from), i) =>
          val to = if (i + 1 < runs.size) Some(runs(i + 1)._2.toString) else None
          (uid, st, from.toString, to, if (to.isEmpty) 1 else 0)
        }
      }.toSet
      assert(got === want, s"trial $trial diverged")
    }
  }

  test("type2: a NULL-state run stays ONE run (lag-null vs first-row ambiguity)") {
    val df = Seq(
      (1L, 10L, 1L, Option.empty[String]),
      (1L, 20L, 2L, Option.empty[String]), // same (null) state: must NOT split
      (1L, 30L, 3L, Option("A")))
      .toDF("user_id", "sec", "event_id", "status")
    val got = Scd.type2(df, "user_id", "status",
        Seq(col("sec"), col("event_id")), col("sec").cast("string"))
      .as[(Long, Option[String], String, Option[String], Int)]
      .collect().sortBy(_._3.toLong).toSeq
    assert(got === Seq(
      (1L, None, "10", Some("30"), 0),
      (1L, Some("A"), "30", None, 1)))
  }
}
