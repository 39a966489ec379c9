package graft.engine

import org.apache.spark.sql.SparkSession

/** Scale-tuned SparkSession factory — the library's recommended entry
  * point, encoding the settings every deployment of this engine needs so
  * callers (and the Verify/Bench mains) don't re-derive them:
  *
  *  - AQE on, with skew-join splitting: runtime re-planning replaces the
  *    reference's static stage planner (SURVEY §3 — Tajo's GlobalPlanner
  *    decides shuffles up front; Spark revises them from runtime stats).
  *  - Shuffle partitions sized by the caller (local: cores; cluster: scale
  *    to input volume) instead of Spark's legacy default of 200, which is
  *    wrong in both directions.
  *  - UTC session timezone: the engine's documented fixed-UTC semantics
  *    (to_char, timestamp renders, the DuckDB oracle contract).
  *  - 128 MiB file partitions: parquet split size that keeps scan tasks
  *    big enough to amortize footer/dictionary decode yet small enough to
  *    parallelize, the knob to retune first when executor memory differs.
  *
  * `local(cores)` is the single-JVM variant used by tests/Verify/Bench;
  * `tune(builder, shufflePartitions)` applies the same settings to any
  * builder (e.g. one carrying a cluster master + GraftExtensions).
  */
object GraftSession {

  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
    // dynamic = INSERT OVERWRITE touches only the partitions the query
    // produces (the reference's partitioned-table semantics; also the only
    // sane mode for incremental 100 TB backfills — a static overwrite of a
    // petabyte table because one day was recomputed is an outage)
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // TIME is feature-flagged in this Spark version; enabling it gives the
    // reference's TIME column type natively (literal, parquet round trip,
    // comparisons) instead of the old TIME->STRING fallback
    .config("spark.sql.timeType.enabled", "true")

  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val s = tune(SparkSession.builder(), cores)
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
