package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table — an *extension* beyond the
  * reference (Tajo has no streaming surface; its Kafka connector batch-scans
  * a topic, reference: tajo-storage/tajo-storage-kafka/src/main/java/org/
  * apache/tajo/storage/kafka/KafkaScanner.java). The batch-verified
  * semantics live in graft.queries.EventsQueries; this module runs the same
  * aggregations incrementally with watermarks.
  */
object EventStreams {

  /** Schema of the events stream (ts arrives as epoch-nanos BIGINT from the
    * driver-generated parquet; converted on ingest). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. Driver drops
    * have shipped `ts` both as TIMESTAMP(NANOS) (read as raw longs via
    * nanosAsLong, then converted) and as TIMESTAMP(MICROS) (read natively);
    * sniff the batch-read type so either layout streams correctly. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val actualTs = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val schema = StructType(rawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = actualTs) else f))
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (actualTs == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Tumbling-hour counts with a 1-hour watermark (late data tolerated up
    * to 1h; state bounded — mandatory for unbounded streams). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("cnt"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("cnt"), col("sum_value"))

  /** Session windows with a 30-minute gap — streaming twin of the batch
    * sessionization query. */
  def sessionCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count("*").as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Streaming exact dedup: emit each distinct key once (first arrival) —
    * the streaming twin of Dedup.exact, backed by the dedup operator's
    * key state. Global semantics (dedup across the whole stream) keep the
    * batch oracle exact (SELECT DISTINCT); state grows with the count of
    * DISTINCT keys — the documented trade, same working set as the batch
    * hash-aggregate. For time-bounded dedup over an unbounded key domain,
    * swap in dropDuplicatesWithinWatermark: same plan shape, state expires
    * with the watermark, dedup guarantee narrows to the watermark window. */
  def dedupKeys(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"))

  /** Stream-stream inner join with watermarks: attribute each purchase to
    * the clicks by the same user in the preceding 30 minutes. Both sides
    * carry a 1-hour watermark and the join has an explicit event-time
    * range, so Spark bounds the buffered state on both sides — the
    * requirement for unbounded sources. Output mode append. */
  def clickPurchaseAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_id"), col("purchase_id"), col("user_id"))
  }

  /** Running per-user activity state maintained across micro-batches. */
  final case class UserActivity(
      user_id: Long, n_events: Long, total_value: Double,
      last_ts: java.sql.Timestamp)

  /** Custom stateful operator via typed mapGroupsWithState: a per-user
    * running profile (event count, value sum, last-seen time) that updates
    * incrementally batch over batch — the pattern for state Spark's built-in
    * window aggregations can't express. State is partitioned by user_id
    * across executors; each key's state is O(1), so the operator scales to
    * arbitrarily many users. A production deployment would add a state TTL
    * (GroupStateTimeout.ProcessingTimeTimeout + state.setTimeoutDuration)
    * to bound the key space. */
  def userActivity(events: DataFrame): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events.selectExpr("user_id", "ts", "value")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserActivity, UserActivity](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[UserActivity]) =>
          val prev = state.getOption.getOrElse(UserActivity(uid, 0L, 0.0, null))
          var n = prev.n_events
          var tv = prev.total_value
          var last = prev.last_ts
          rows.foreach { case (_, ts, v) =>
            n += 1
            tv += v
            if (last == null || ts.after(last)) last = ts
          }
          val next = UserActivity(uid, n, tv, last)
          state.update(next)
          next
      }
  }

  /** Streaming distinct users per hour via a MERGEABLE HLL sketch — the
    * unbounded-stream shape of a distinct count: per-hour state is one
    * k-byte sketch (bounded, watermark-expired), never a user set, and the
    * same sketches union with batch/backfill sketches (Sketches.
    * mergeSketches). The driver oracle compares against DuckDB's exact
    * COUNT(DISTINCT): legitimate because per-hour user cardinality (≤166
    * at sf0.1) is deep inside the lgK=21 sparse coupon-EXACT regime — the
    * same measured bound SketchesSpec pins (exact through n=4000). */
  def hourlyDistinctUsers(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(hll_sketch_agg(col("user_id"), lit(21)).as("sk"))
      .select(col("window.start").as("hour"),
        graft.operators.Sketches.estimate(col("sk")).as("n_users_est"))

  /** Streaming count-min counters over the user stream — heavy-hitter
    * tracking with STATE BOUNDED BY CONSTRUCTION: the aggregation keys are
    * (plane, bucket), so state is depth×width counter rows no matter how
    * long the stream runs (contrast dropDuplicates' distinct-key state).
    * The base hash is the portable (user_id · 2654435761) mod P spelling,
    * so the whole sketch — including collision overestimates — replays
    * bit-for-bit in a batch engine; counters also merge ADDITIVELY with
    * batch-built counters from [[graft.operators.Sketches]] (same planes,
    * same constants). */
  def userCountMinCounters(events: DataFrame, width: Int = 512,
                           depth: Int = 3): DataFrame = {
    val P = graft.operators.Sketches.CmsP
    // base hash normalized into [0, P) BEFORE the multiply so neither
    // engine overflows (pmod(id) < P and 2654435761 % P < P keep the
    // product under 2^63 for ANY user_id, negative included) — the oracle
    // spells the identical pmod/multiply/mod chain
    val hashed = events.select(
      (pmod(col("user_id"), lit(P)) * lit(2654435761L % P) % P).as("h"))
    // the counter build itself IS Sketches.countMinCounters — one
    // implementation, so stream- and batch-built counters stay plane-
    // identical and merge additively by construction
    graft.operators.Sketches.countMinCounters(hashed, "h", width, depth)
  }

  /** Run a streaming aggregation to completion against the (finite) file
    * source and return the result table — used by tests and demos; a real
    * deployment would writeStream to kafka/parquet with a checkpoint dir.
    *
    * The number of state-store instances is frozen from
    * spark.sql.shuffle.partitions at the first micro-batch; 8 is plenty for
    * the finite verify source and saves ~24 store setups per batch. (On a
    * real cluster the caller sizes shuffle partitions to the stream volume
    * before starting the query — this override only scopes the demo sink.) */
  def runToMemoryTable(agg: DataFrame, name: String,
                       mode: String = "complete"): DataFrame = {
    val spark = agg.sparkSession
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q: StreamingQuery = agg.writeStream
        .outputMode(mode)
        .format("memory").queryName(name)
        .start()
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
  }
}
