package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp
import EventStreams._

/** Demo / smoke driver for the streaming module: runs real streaming queries
  * (micro-batch engine, memory source+sink) through the public API.
  * `sbt "runMain graft.streaming.StreamDemo"`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val in = MemoryStream[EventRow]
    // NoTimeout default: evictAfter would require a real trigger interval —
    // with the default as-fast-as-possible trigger, timeout evaluation
    // schedules micro-batches continually and processAllAvailable never
    // settles (see EventStreams.sessionize scaladoc).
    val q = sessionize(in.toDS())
      .writeStream.format("memory").queryName("demo_sessions")
      .outputMode(OutputMode.Update).start()
    in.addData(EventRow(1, Timestamp.valueOf("2024-01-01 10:00:00"), 42, "click", 1.0))
    q.processAllAvailable()
    in.addData(EventRow(2, Timestamp.valueOf("2024-01-01 13:00:00"), 42, "click", 1.0))
    q.processAllAvailable()
    println("[demo] sessions updates: " +
      spark.table("demo_sessions").collect().mkString(", "))
    q.stop()

    val in2 = MemoryStream[EventRow]
    val q2 = hourlyCounts(in2.toDF())
      .writeStream.format("memory").queryName("demo_hourly")
      .outputMode(OutputMode.Update).start()
    in2.addData(EventRow(3, Timestamp.valueOf("2024-01-01 10:15:00"), 7, "view", 2.5))
    q2.processAllAvailable()
    println("[demo] hourly rows: " +
      spark.table("demo_hourly").collect().mkString(", "))
    q2.stop()
    spark.stop()
  }
}
