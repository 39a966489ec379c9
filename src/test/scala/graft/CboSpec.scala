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
}
