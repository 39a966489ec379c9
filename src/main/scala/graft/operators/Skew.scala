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
}
