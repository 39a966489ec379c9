package graft.tools

/** Variance adjudicator (VERDICT r7 #4/#6): run ONE registry query N
  * consecutive times in a warm solo JVM and print every wall time — the
  * evidence format SCALING.md's noise-vs-regression calls cite. A retry
  * policy hides variance; this prints the raw sequence.
  *
  * Usage: runMain graft.tools.SoloTimes <queryName> [n=5] [sfDir=sf0.1]
  */
object SoloTimes {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: SoloTimes <query> [n] [sfDir]"))
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local(32, s"solo-$name")
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.register(spark, sfDir)
    graft.engine.Tables.all.foreach(t => spark.table(t).limit(1).count())
    val q = graft.SparkEntry.registry.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      q.run(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      // OUTSIDE the timed window: release localCheckpoint blocks the
      // finished run's returned plan still pins — same post-run hygiene as
      // the bench, so back-to-back solos measure the query, not the
      // accumulation of its predecessors' blocks (VERDICT r12 #1)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"[solo] $name run $i: $t%.3f s")
      t
    }
    val sorted = times.sorted
    println(f"[solo] $name n=$n min=${sorted.head}%.3f med=${sorted(n / 2)}%.3f " +
      f"max=${sorted.last}%.3f spread=${sorted.last / sorted.head}%.2fx")
    spark.stop()
  }
}
