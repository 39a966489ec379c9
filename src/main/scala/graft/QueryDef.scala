package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.Tables

/** One verifiable unit of engine surface: a named Spark query plus (when
  * SQL-expressible) an equivalent DuckDB oracle. The driver hash-compares
  * the two at sf0.01 (see the contract in SparkEntry).
  *
  * Determinism contract for oracle-checked queries:
  *   - every aggregation over DOUBLE goes through DECIMAL(38,x) so partial
  *     aggregation order can't change low-order bits;
  *   - every result has a total ORDER BY over a unique key set;
  *   - computed integer columns are CAST to BIGINT (Spark INT vs DuckDB
  *     HUGEINT/BIGINT width differences).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object QueryDef {
  /** SQL text that parses identically in Spark and DuckDB. */
  def shared(name: String, sql: String, headline: Boolean = false): QueryDef =
    QueryDef(name, (sp, dir) => { Tables.register(sp, dir); sp.sql(sql) }, Some(sql), headline)

  /** Same semantics, dialect-specific spellings. */
  def split(name: String, sparkSql: String, duckSql: String, headline: Boolean = false): QueryDef =
    QueryDef(name, (sp, dir) => { Tables.register(sp, dir); sp.sql(sparkSql) }, Some(duckSql), headline)

  /** DataFrame-API query; oracle optional (None → driver rows-only check). */
  def df(name: String, run: (SparkSession, String) => DataFrame,
         duckSql: Option[String] = None, headline: Boolean = false): QueryDef =
    QueryDef(name, (sp, dir) => { Tables.register(sp, dir); run(sp, dir) }, duckSql, headline)
}
