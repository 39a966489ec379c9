package graft.tools

/** Scratch adjudicator for VERDICT r13 #1: q_store_jdbc_agg read
  * 0.73s (r12) -> 2.08s/1.66s in BOTH r13 driver runs, and the one harness
  * change aimed at that family is the churn-phase Derby engine prime
  * (Bench.scala), which creates an in-memory database and (r13) never
  * dropped it. This probe A/Bs the prime's three shapes in otherwise
  * identical fresh-warm sessions:
  *
  *   noprime    — no Derby touch before the timed runs (the r12 shape)
  *   prime-hold — prime the engine, LEAVE the memory DB alive (the r13 shape)
  *   prime-drop — prime the engine, drop the memory DB (the r14 fix)
  *
  * Prints n warm solo times for q_store_jdbc_agg with an interleaved
  * q1_agg control every 4 runs (same-box ratio discipline — this box
  * swings 1.5-4x between hours, so only within-run ratios are evidence).
  * Usage: runMain graft.tools.JdbcProbe <mode> [n=10] [sfDir]
  */
object JdbcProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("noprime")
    val n = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    require(Seq("noprime", "prime-hold", "prime-drop").contains(mode),
      s"unknown mode $mode")
    val spark = graft.engine.GraftSession.local(32, s"jdbc-probe-$mode")
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.register(spark, sfDir)
    graft.engine.Tables.all.foreach(t => spark.table(t).limit(1).count())
    // same write-path prime as the bench churn phase, so the first timed
    // run does not absorb committer/codec init in any mode
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_probe")
    spark.table("region").write.mode("overwrite").parquet(s"$tmp/p")
    spark.read.parquet(s"$tmp/p").count()
    org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    if (mode != "noprime") {
      val c = java.sql.DriverManager.getConnection(
        "jdbc:derby:memory:graft_bench_jdbc_warm;create=true")
      c.close()
      if (mode == "prime-drop")
        try java.sql.DriverManager.getConnection(
          "jdbc:derby:memory:graft_bench_jdbc_warm;drop=true")
        catch { case _: java.sql.SQLException => () } // 08006 = dropped
    }
    val q = graft.SparkEntry.registry.find(_.name == "q_store_jdbc_agg").get
    val ctl = graft.SparkEntry.registry.find(_.name == "q1_agg").get
    def time(qd: graft.QueryDef): Double = {
      val t0 = System.nanoTime()
      qd.run(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      t
    }
    val times = (1 to n).map { i =>
      if ((i - 1) % 4 == 0) println(f"[jdbc-probe] $mode control q1_agg: ${time(ctl)}%.3f s")
      val t = time(q)
      println(f"[jdbc-probe] $mode run $i: $t%.3f s")
      t
    }
    val s = times.sorted
    println(f"[jdbc-probe] $mode n=$n min=${s.head}%.3f med=${s(n / 2)}%.3f " +
      f"max=${s.last}%.3f")
    spark.stop()
  }
}
