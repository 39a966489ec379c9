package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Plan-shape audit for the bucketed co-located join: writing both join
  * sides bucketBy(N) on the key must eliminate the shuffle exchanges under
  * the sort-merge join — the property that makes repeated fact-fact joins
  * affordable at scale. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed sort-merge join has no shuffle exchange on its inputs") {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_bucketing_spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.sql("DROP TABLE IF EXISTS bspec_orders")
    spark.sql("DROP TABLE IF EXISTS bspec_lineitem")
    graft.engine.Tables.table(spark, sfDir, "orders")
      .write.option("path", s"$tmp/orders")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("bspec_orders")
    graft.engine.Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.option("path", s"$tmp/lineitem")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("bspec_lineitem")

    val joined = spark.table("bspec_orders").hint("merge")
      .join(spark.table("bspec_lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "l_quantity")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)

    // Same join over the raw (unbucketed) parquet DOES shuffle both sides —
    // the exchange elimination really is the bucketing, not the data size.
    val raw = graft.engine.Tables.table(spark, sfDir, "orders").hint("merge")
      .join(graft.engine.Tables.table(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "l_quantity")
    assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))

    spark.sql("DROP TABLE IF EXISTS bspec_orders")
    spark.sql("DROP TABLE IF EXISTS bspec_lineitem")
  }
}
