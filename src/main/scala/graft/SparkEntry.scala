package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared as a QueryDef in
  * graft.queries.* (Spark query + DuckDB oracle); this object just flattens
  * the registry into the driver's shape.
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    queries0.distinctBy(_.name)

  private def queries0: Seq[QueryDef] =
    graft.queries.CoreQueries.all ++
    graft.queries.TpchQueries.all ++
    graft.queries.FunctionQueries.all ++
    graft.queries.EventsQueries.all ++
    graft.queries.StorageQueries.all ++
    graft.queries.PipelineQueries.all ++
    graft.queries.OperatorQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val q = registry.find(_.name == "q5_join_multi").get
    q.run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Subset used for headline bench reporting. */
  def headlines: Seq[String] = registry.filter(_.headline).map(_.name)
}
