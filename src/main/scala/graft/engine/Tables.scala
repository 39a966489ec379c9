package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog bootstrap: registers the driver-generated testdata parquet tables
  * (see TESTDATA.md) as temp views, and installs the Tajo-compat function
  * layer. Mirrors the reference's benchmark table registration
  * (reference: tajo-core/src/main/java/org/apache/tajo/benchmark/TPCH.java:72-181)
  * but through the Spark session catalog, so both `spark.sql` and the
  * DataFrame API see the same tables.
  *
  * Scale note: view registration is lazy (footer-only schema read); scans,
  * filter pushdown and column pruning happen per query via Catalyst.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Re-registering identical views per query is wasted footer I/O at bench
  // time; remember which dir is currently mounted per session.
  private val mounted = new java.util.concurrent.ConcurrentHashMap[Integer, String]()

  def register(spark: SparkSession, dir: String): Unit = {
    graft.functions.TajoFunctions.register(spark)
    val key = Integer.valueOf(System.identityHashCode(spark))
    if (mounted.get(key) != dir) {
      all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
      mounted.put(key, dir)
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has been generated as TIMESTAMP(NANOS) in some driver drops
    // (which Spark's vectorized reader rejects — read as raw nanos and
    // convert) and as TIMESTAMP(MICROS) in others (reads natively). Sniff
    // the loaded type and convert only when the nanos path kicked in.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else if (name == "events")
      // Micros drops read as TIMESTAMP_NTZ; cast to the session-UTC
      // TimestampType every query has consumed since round 1.
      df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    else df
  }
}
