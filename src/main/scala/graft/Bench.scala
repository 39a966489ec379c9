package graft


/** Driver-run benchmark: times every registry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line {"metric","value","unit","queries","sf"}. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.GraftSession.local(cpus, "graft-bench")

    // Warm-up outside the timings: mount views, load parquet footers, prime
    // codegen — otherwise whichever query runs first absorbs ~6s of session
    // start-up and the per-query numbers are noise.
    graft.engine.Tables.register(spark, sfDir)
    graft.engine.Tables.all.foreach(t => spark.table(t).limit(1).count())
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    // Optional comma-separated name filter for focused perf iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.registry)(f => SparkEntry.registry.filter(q => f(q.name)))
    // A failed query must be loud: named on stderr AND listed in the JSON —
    // a regression that breaks a query must not masquerade as a speedup.
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = selected.map { q =>
      val t0 = System.nanoTime()
      val ok = try { q.run(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAIL ${q.name}: ${e.getClass.getSimpleName}: ${e.getMessage}")
          errors += q.name
          false
      }
      q.name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // Persist too: the driver's stdout tail capture truncates long lines.
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
