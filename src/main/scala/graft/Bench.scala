package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line {"metric","value","unit","queries","sf"}. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up outside the timings: mount views, load parquet footers, prime
    // codegen — otherwise whichever query runs first absorbs ~6s of session
    // start-up and the per-query numbers are noise.
    graft.engine.Tables.register(spark, sfDir)
    graft.engine.Tables.all.foreach(t => spark.table(t).limit(1).count())
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    // Optional comma-separated name filter for focused perf iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.registry)(f => SparkEntry.registry.filter(q => f(q.name)))
    val results = selected.map { q =>
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count() } catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
