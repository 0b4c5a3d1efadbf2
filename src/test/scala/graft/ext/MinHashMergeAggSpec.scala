package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashMergeAggSpec extends SparkSpec {
  import spark.implicits._

  test("grouped merge through Spark == element-wise min of member signatures") {
    val docs = Seq(
      (0L, "g1", (1 to 40).map(i => s"w$i").mkString(" ")),
      (1L, "g1", (20 to 60).map(i => s"w$i").mkString(" ")),
      (2L, "g2", (100 to 140).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "source", "text")

    val sigs = MinHashDedup.signatures(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
    val perDoc = sigs.select($"source", $"sig").as[(String, Array[Long])].collect()

    val merged = sigs.select($"source", $"sig").as[(String, Array[Long])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new MinHashMergeAgg(128).toColumn.name("sig"))
      .collect().toMap

    val expectedG1 = perDoc.filter(_._1 == "g1").map(_._2)
      .reduce((a, b) => a.zip(b).map { case (x, y) => math.min(x, y) })
    assert(merged("g1").toSeq === expectedG1.toSeq)
    assert(merged("g2").toSeq === perDoc.find(_._1 == "g2").get._2.toSeq)

    // mergeability property: sketch of a group bounds each member
    merged("g1").zip(perDoc.filter(_._1 == "g1").head._2)
      .foreach { case (m, s) => assert(m <= s) }
  }
}
