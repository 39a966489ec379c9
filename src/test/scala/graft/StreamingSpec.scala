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

  test("streaming near-dup pairs equal the batch operator and are micro-batch-split invariant") {
    import graft.streaming.StreamingDedup
    // seeded near-dups so the pair set is non-trivial, split across TWO
    // parquet files so maxFilesPerTrigger=1 forces two micro-batches —
    // cross-batch pairs must come from state, same-batch pairs from the
    // in-batch comparison; a state bug breaks one of the two runs
    val base = Tables.table(spark, sfDir, "documents").limit(200)
    val perturbed = base.filter(col("doc_id") % 5 === 0).select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" tailnoise")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("stream_neardup").toString
    try {
      // lay out two single-file directories, each holding a file named
      // documents.parquet (what readDocuments' pathGlobFilter streams)
      base.coalesce(1).write.parquet(s"$dir/part_a")
      perturbed.coalesce(1).write.parquet(s"$dir/part_b")
      new java.io.File(s"$dir/in1").mkdirs(); new java.io.File(s"$dir/in2").mkdirs()
      Seq("part_a" -> "in1", "part_b" -> "in2").foreach { case (from, to) =>
        val f = new java.io.File(s"$dir/$from").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$dir/$to/documents.parquet"))
      }
      val union = spark.read.parquet(s"$dir/in1/documents.parquet", s"$dir/in2/documents.parquet")
      val expected = graft.operators.Dedup
        .simhashNearDupsWide(union, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(expected.nonEmpty, "seeded near-dups must produce pairs")
      def streamed(maxFiles: Option[Int], glob: String, name: String): Set[(Long, Long, Long)] = {
        var reader = spark.readStream.schema(StreamingDedup.docSchema)
          .option("pathGlobFilter", "documents.parquet")
        maxFiles.foreach(n => reader = reader.option("maxFilesPerTrigger", n.toString))
        val docs = reader.parquet(s"$dir/$glob")
        val pairs = StreamingDedup.nearDupPairs(docs).toDF()
        EventStreams.runToMemoryTable(pairs, name, mode = "append")
          .distinct().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      }
      val oneBatch = streamed(None, "in*", "t_neardup_1")
      val twoBatch = streamed(Some(1), "in*", "t_neardup_2")
      assert(oneBatch == expected, "single-batch stream must equal the batch operator")
      assert(twoBatch == expected, "two-batch stream must equal the batch operator")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
