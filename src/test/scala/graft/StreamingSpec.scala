package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.engine.Tables

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming hourly counts equal the batch aggregation") {
    val stream = EventStreams.runToMemoryTable(
      EventStreams.hourlyCounts(EventStreams.readEvents(spark, sfDir)), "t_hourly")
    val batch = Tables.table(spark, sfDir, "events")
      .groupBy(date_trunc("HOUR", col("ts")).as("hour"), col("event_type"))
      .agg(count("*").as("cnt"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("sum_value"))
    val s = stream.orderBy("hour", "event_type").collect().map(_.toSeq)
    val b = batch.orderBy("hour", "event_type").collect().map(_.toSeq)
    assert(s.length == b.length)
    assert(s.sameElements(b))
  }

  test("streaming session windows produce bounded sessions per user") {
    val sess = EventStreams.runToMemoryTable(
      EventStreams.sessionCounts(EventStreams.readEvents(spark, sfDir)), "t_sessions")
    val rows = sess.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.table(spark, sfDir, "events").count())
  }
}
