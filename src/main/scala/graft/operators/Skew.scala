package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * The reference splits oversized hash partitions with
  * SCATTERED_HASH_SHUFFLE (reference: tajo-core/src/main/java/org/apache/
  * tajo/querymaster/Repartitioner.java:1098, Plan.proto:549). Spark's AQE
  * skew-join does this automatically for sort-merge joins; `saltedJoin` is
  * the explicit variant for when AQE can't help (e.g. shuffled hash joins,
  * or aggregations keyed on a hot value).
  */
object Skew {

  /** Equi-join `fact` (skewed side) to `dim` on `key`, spreading each hot
    * key over `salts` shuffle partitions: the fact side gets a deterministic
    * per-row salt, the dim side is replicated `salts` times. Result equals
    * the plain inner join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // xxhash64 over the fact row's columns gives a deterministic, well-mixed
    // salt without needing a row id.
    val saltExpr = pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts))
    val saltedFact = fact.withColumn("__salt", saltExpr)
    // sequence over longs so the exploded salt is BIGINT like the fact side
    // (Spark rejects a cast wrapped around a generator).
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage aggregation for a hot grouping key: partial aggregate on
    * (key, salt), then final aggregate on key. `aggs` must be decomposable
    * (sum/count/min/max). */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
    salted.groupBy(col(key), col("__salt")).agg(count("*").as("__partial"))
      .groupBy(col(key)).agg(sum("__partial").as("cnt"))
  }

  /** Pre-shuffle skew diagnosis for a prospective join/agg key: per-key
    * row counts reduced to the numbers that decide a plan — key count,
    * max/total rows, the hot key itself, skew ratio (max over mean, ppm),
    * and the salt factor [[saltedJoin]] would need to flatten the hot key
    * to ~mean (max DIV mean, floored at 1). Run it on a 100 TB input
    * BEFORE committing to a partitioning: it is one partial+final count
    * on the key and a second tiny aggregation over the per-key counts —
    * strictly cheaper than the shuffle it de-risks, and the output is one
    * row. Ties on the hot key break by key value (min), so the report is
    * deterministic. */
  def diagnoseKey(df: DataFrame, key: String): DataFrame = {
    val perKey = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    perKey.agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_n"),
        min(struct(negate(col("n")).as("nn"), col(key).cast("string").as("k")))
          .as("__hot"))
      .select(col("n_keys"), col("n_rows"), col("max_n"),
        col("__hot.k").as("hot_key"),
        // empty input leaves n_keys = 0: report NULLs, don't let ANSI mode
        // turn the planning probe itself into a DIVIDE_BY_ZERO failure
        expr("CASE WHEN n_keys = 0 THEN NULL " +
          "ELSE (1000000 * max_n) DIV (n_rows DIV n_keys) END").as("skew_ppm"),
        expr("CASE WHEN n_keys = 0 THEN NULL " +
          "ELSE GREATEST(1L, max_n DIV (n_rows DIV n_keys)) END").as("suggested_salts"))
  }
}
