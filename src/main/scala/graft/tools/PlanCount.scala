package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scratch profiler: how many times does a query's EXECUTED plan scan its
  * source files, and how many exchanges does it run? Re-evaluated subplans
  * show up as repeated FileScans — the shape behind "this operator costs
  * 3x its data". Usage: tools/run_main.sh graft.tools.PlanCount <query> [sfDir].
  */
object PlanCount {

  /** Every node of a physical plan, descending through AQE re-plans,
    * materialized query stages, and subqueries — the walk both this main
    * and `ScanBudgetSpec` count over. ReusedExchangeExec is a LEAF here:
    * its subtree is the shared original, and descending it would count one
    * physical scan twice. Note AQE only finalizes the plan of a
    * QueryExecution that has itself been executed (Dataset.count() runs a
    * DIFFERENT QueryExecution) — run `df.collect()` first, or accept the
    * statically planned tree (scan multiplicity is decided at planning;
    * AQE can only merge exchanges, not add scans). */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: allNodes(q.plan)
    case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(p)
    case _ => p +: (p.children.flatMap(allNodes) ++ p.subqueries.flatMap(allNodes))
  }

  /** Number of file-source scans in the query's plan — each one is a full
    * read of some source; at 100 TB every extra count is an extra corpus
    * pass, the re-evaluation defect class SCALING §8b documents. Counted
    * on the statically planned tree (see [[allNodes]]): an upper bound AQE
    * can shrink via runtime exchange reuse but never exceed. */
  def fileScanCount(df: org.apache.spark.sql.DataFrame): Int =
    allNodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: PlanCount <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local(32, s"plancount-$name")
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.register(spark, sfDir)
    val q = graft.SparkEntry.registry.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    val df = q.run(spark, sfDir)
    // collect() executes THIS QueryExecution, so the walk below sees the
    // AQE-finalized stages (runtime reuse included), not the initial plan
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    val counts = nodes.groupBy(_.nodeName).view.mapValues(_.size).toSeq
      .filter { case (n, _) =>
        n.contains("Scan") || n.contains("Exchange") || n.contains("Reused") ||
          n.contains("Aggregate") || n.contains("Generate") || n.contains("Window") }
      .sortBy(-_._2)
    counts.foreach { case (n, c) => println(f"[plancount] $c%3d  $n") }
    spark.stop()
  }
}
