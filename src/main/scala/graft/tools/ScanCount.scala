package graft.tools

/** Scratch: print the STATIC file-scan count (the ScanBudgetSpec walk) for
  * a list of queries at a given sf — used to audit budgets before pinning.
  * Usage: runMain graft.tools.ScanCount <sfDir> <query...> */
object ScanCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.engine.GraftSession.local(32, "scancount")
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.register(spark, sfDir)
    args.drop(1).foreach { name =>
      val q = graft.SparkEntry.registry.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      try {
        val n = PlanCount.fileScanCount(q.run(spark, sfDir))
        println(s"[scancount] $name: $n")
      } catch { case e: Throwable =>
        println(s"[scancount] $name: FAILED ${e.getMessage.take(80)}") }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
