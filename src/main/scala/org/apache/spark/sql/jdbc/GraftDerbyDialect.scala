package org.apache.spark.sql.jdbc

/** Derby dialect extension enabling LIMIT / top-N pushdown into the remote
  * SQL. The reference's JDBC tablespace composes full remote statements —
  * projection, predicates, GROUP BY and LIMIT — in `SQLBuilder`
  * (tajo-storage/tajo-storage-jdbc/src/main/java/org/apache/tajo/storage/
  * jdbc/SQLBuilder.java); Spark's stock `DerbyDialect` stops short of the
  * limit clause (`supportsLimit = false`, empty `getLimitClause`), because
  * Derby has no `LIMIT n` spelling — but it DOES speak the SQL:2008
  * `FETCH FIRST n ROWS ONLY` form, which Spark's JDBCRDD appends in
  * exactly the position Derby requires (after ORDER BY). Registering this
  * dialect lets the DSv2 JDBC scan push LIMIT and ORDER BY+LIMIT (top-N)
  * to the remote engine, so a `LIMIT 10` over a large remote table moves
  * 10 rows instead of the table through the wire — the remote-pushdown
  * discipline that matters at scale, where the JDBC link is the narrowest
  * pipe in the plan.
  *
  * Lives in Spark's jdbc package because `DerbyDialect` is `private[sql]`;
  * subclassing it (rather than re-implementing a JdbcDialect from scratch)
  * keeps every Derby type mapping, error classification and aggregate
  * compilation rule inherited, overriding ONLY the two limit hooks —
  * the registration API itself (`JdbcDialects.registerDialect`) is public.
  *
  * Offset stays unsupported: Derby requires `OFFSET ... FETCH ...` in that
  * order, while Spark appends the limit clause BEFORE the offset clause —
  * the composed SQL would be invalid, so we don't claim it.
  */
private[jdbc] class GraftDerbyDialect extends DerbyDialect {
  override def supportsLimit: Boolean = true
  override def getLimitClause(limit: Integer): String =
    if (limit > 0) s"FETCH FIRST $limit ROWS ONLY" else ""
}

object GraftDerbyDialect {
  private val instance: JdbcDialect = new GraftDerbyDialect
  @volatile private var registered = false

  /** Idempotent: JdbcDialects.registerDialect PREPENDS, so repeated calls
    * would shadow-stack duplicates. First match wins, and this dialect
    * `canHandle`s the same jdbc:derby: prefix as the stock one. */
  def register(): Unit = synchronized {
    if (!registered) { JdbcDialects.registerDialect(instance); registered = true }
  }
}
