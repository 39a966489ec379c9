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

  test("streaming exact dedup emits each distinct key once (batch DISTINCT)") {
    val stream = EventStreams.runToMemoryTable(
      EventStreams.dedupKeys(EventStreams.readEvents(spark, sfDir)),
      "t_dedup", mode = "append")
    val batch = Tables.table(spark, sfDir, "events")
      .select("user_id", "event_type").distinct()
    val s = stream.orderBy("user_id", "event_type").collect().map(_.toSeq)
    val b = batch.orderBy("user_id", "event_type").collect().map(_.toSeq)
    assert(s.length == b.length)
    assert(s.sameElements(b))
  }

  test("mapGroupsWithState user activity matches the batch profile") {
    val state = EventStreams.runToMemoryTable(
      EventStreams.userActivity(EventStreams.readEvents(spark, sfDir)).toDF(),
      "t_user_activity", mode = "update")
    val batch = Tables.table(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(count("*").as("n_events"), max("ts").as("last_ts"))
    // one micro-batch over the finite source → memory table holds the final
    // state row per user
    val s = state.select("user_id", "n_events", "last_ts")
      .orderBy("user_id").collect().map(_.toSeq)
    val b = batch.select("user_id", "n_events", "last_ts")
      .orderBy("user_id").collect().map(_.toSeq)
    assert(s.length == b.length)
    assert(s.sameElements(b))
  }

  test("stream-stream watermarked join equals the batch join") {
    val stream = EventStreams.runToMemoryTable(
      EventStreams.clickPurchaseAttribution(EventStreams.readEvents(spark, sfDir)),
      "t_click_purchase", mode = "append")
    val e = Tables.table(spark, sfDir, "events")
    val batch = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
      .join(e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("pu"), col("ts").as("pts")),
        col("user_id") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .select("click_id", "purchase_id", "user_id")
    val s = stream.orderBy("click_id", "purchase_id").collect().map(_.toSeq)
    val b = batch.orderBy("click_id", "purchase_id").collect().map(_.toSeq)
    assert(s.length == b.length && s.sameElements(b))
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
