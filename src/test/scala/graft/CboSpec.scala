package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference drives join order, broadcast choice, and range-shuffle
  * boundaries from catalog statistics (reference: tajo-catalog/
  * tajo-catalog-common/src/main/java/org/apache/tajo/catalog/statistics/).
  * Spark's counterpart is ANALYZE TABLE + the cost-based optimizer; this
  * spec pins that the stats actually reach the optimized plan. */
class CboSpec extends AnyFunSuite {
  import TestSpark._

  test("ANALYZE TABLE feeds row counts and column stats into the plan") {
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS cbo_nation")
      graft.engine.Tables.table(spark, sfDir, "nation")
        .write.mode("overwrite").saveAsTable("cbo_nation")
      spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")

      val stats = spark.table("cbo_nation").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == 25L), s"rowCount: ${stats.rowCount}")
      assert(stats.attributeStats.nonEmpty, "expected per-column stats")
      val keyStats = stats.attributeStats.find(_._1.name == "n_nationkey").map(_._2)
      assert(keyStats.exists(_.distinctCount.exists(_.toLong == 25L)),
        s"n_nationkey NDV: $keyStats")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_nation")
      spark.conf.set("spark.sql.cbo.enabled", prev)
    }
  }

  test("runtime bloom-filter pruning: selective dim filter probes the fact shuffle side") {
    // At 100 TB a selective dim filter should prune the fact's SHUFFLE
    // join probe side at runtime (the non-partition-column sibling of
    // DPP). Default-on in this Spark; the size thresholds just need the
    // test scale. Pin that the injected filter actually lands.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = graft.engine.Tables.table(spark, sfDir, "lineitem")
      val dim = graft.engine.Tables.table(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      // renders as might_contain(scalar-subquery [...]) over a
      // bloom_filter_agg build on the filtered dim keys
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter probing the fact side:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE skew join: a hot key is split at runtime (skew=true in the final plan)") {
    // The automatic sibling of Skew.saltedJoin: AQE detects the oversized
    // shuffle partition post-shuffle and splits it. Thresholds are scaled
    // to the test corpus; the discipline pinned is that detection actually
    // triggers — the salting operator remains for the cases AQE can't see.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key carrying ~100k rows vs 99 cold keys. The payload must
      // SURVIVE column pruning (max(payload) downstream): a constant-only
      // hot partition RLE-compresses to nothing and AQE correctly sees no
      // skew in bytes — skew is a byte property, not a row-count property.
      val left = spark.range(100000)
        .select(lit(0L).as("k"), concat(lit("payload-"), col("id")).as("payload"))
        .union(spark.range(1000).select((col("id") % 99 + 1).as("k"),
          concat(lit("p"), col("id"))))
      val right = (0L to 99L).toDF("k").withColumn("tag", col("k") * 2)
      val joined = left.join(right, "k").groupBy("tag")
        .agg(count(lit(1)).as("n"), max("payload").as("mp"))
      joined.collect() // AQE decides skew splits at RUNTIME — must execute
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"expected a skew-split join:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
