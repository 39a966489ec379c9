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

  /** Count-min sketch hash plane: depth rows of (multiplier, offset) for
    * the universal-hash family h_j(H) = ((a_j·H + b_j) mod P) mod width,
    * seeded from ONE base hash H (the standard CMS construction). Prime
    * constants are part of the spec so oracles replay them. */
  val CmsP = 1000000007L
  val CmsA: Seq[Long] = Seq(1299709L, 15485863L, 32452843L, 49979687L, 67867967L)
  val CmsB: Seq[Long] = Seq(104729L, 1299721L, 15485867L, 86028121L, 104395301L)

  /** Build count-min counters from a base-hash occurrence stream: one row
    * per (j, bucket) with the occurrence count — depth×width rows TOTAL,
    * no matter the corpus size. Unlike HLL, every arithmetic step here is
    * integer-exact, so estimates replay bit-for-bit in any engine.
    *
    * Mergeability: counters are plain sums — counters(A ∪ B) =
    * counters(A) + counters(B) bucket-wise (spec-pinned), so shards/days
    * sketch independently and ADD.
    *
    * Scale: the input is one narrow column of BIGINTs (e.g. native
    * `gram_hashes(text, 1)` exploded — codegen'd, no string shuffle); the
    * only shuffle is the partial+final count on (j, bucket), whose key
    * space is depth×width — thousands of rows from petabytes of input. */
  /** Plane buckets for a base hash, with the hash first normalized into
    * [0, P) via pmod so ANY BIGINT input (xxhash64's full signed range
    * included) is valid: a·h would overflow BIGINT for |h| > ~1.4e11 and
    * Java-style % would emit negative buckets. For hashes already in
    * [0, P) — poly31 — pmod is the identity, so oracles spell the plane
    * hash without it. */
  private def cmsPlanes(hCol: String, width: Int, depth: Int) =
    (0 until depth).map { j =>
      struct(lit(j).as("j"),
        (((lit(CmsA(j)) * pmod(col(hCol), lit(CmsP)) + lit(CmsB(j))) % CmsP) % width)
          .as("bucket"))
    }

  def countMinCounters(hashes: DataFrame, hCol: String,
                       width: Int = 512, depth: Int = 3): DataFrame = {
    require(depth >= 1 && depth <= CmsA.length && width > 0)
    hashes.select(explode(array(cmsPlanes(hCol, width, depth): _*)).as("p"))
      .groupBy(col("p.j").as("j"), col("p.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-estimate occurrence counts for query keys against CMS counters:
    * est(H) = MIN over j of counter[j][h_j(H)] — an overestimate by at
    * most the collision mass (never an underestimate; spec-pinned).
    * `queries` carries the base hash in `hCol` plus any passthrough
    * columns; counters are depth×width-sized and broadcast. */
  def countMinEstimate(counters: DataFrame, queries: DataFrame, hCol: String,
                       width: Int = 512, depth: Int = 3): DataFrame = {
    require(depth >= 1 && depth <= CmsA.length && width > 0)
    val keyCols = queries.columns.filter(_ != hCol)
    queries.select(col("*"), explode(array(cmsPlanes(hCol, width, depth): _*)).as("p"))
      .select((keyCols.map(col) :+ col("p.j").as("j") :+ col("p.bucket").as("bucket")): _*)
      // LEFT join: a plane bucket no occurrence ever hit has an implicit
      // zero counter — it must participate in the min (an inner join would
      // skip it, overestimating unseen keys, and a key with ALL planes
      // empty would vanish instead of estimating 0)
      .join(broadcast(counters), Seq("j", "bucket"), "left")
      .groupBy(keyCols.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }

  /** Distinct whitespace-tokens per source, sketched per (source, shard)
    * and MERGED per source plus a corpus-wide `~all~` rollup (tilde so the
    * rollup sorts after every source name) — the exact
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
