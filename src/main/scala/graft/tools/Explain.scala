package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection helper: prints the formatted physical plan for the given
  * query names (or the headline set) — used to audit pushdown, join
  * strategy, and codegen coverage. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.headlines
    names.foreach { n =>
      val q = graft.SparkEntry.registry.find(_.name == n).getOrElse(sys.error(s"unknown query $n"))
      println(s"\n===================== $n =====================")
      println(q.run(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
