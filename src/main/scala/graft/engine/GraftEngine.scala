package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tajo-flavored SQL/DDL front end over the Spark session catalog.
  *
  * The reference executes DDL in its master (reference: tajo-core/src/main/
  * java/org/apache/tajo/master/exec/DDLExecutor.java) with a grammar that
  * differs from Spark in a few spots (reference: tajo-sql-parser/src/main/
  * antlr4/org/apache/tajo/parser/sql/SQLParser.g4:37-185): `USING <fmt>
  * WITH ('k'='v')` storage clauses, `PARTITION BY COLUMN (...)`, `SET
  * SESSION`, `SET TIME ZONE`, `EXPLAIN GLOBAL`. This facade rewrites those
  * forms into Spark SQL and forwards everything else untouched, so a Tajo
  * user's scripts keep working while Catalyst does the execution.
  */
class GraftEngine(val spark: SparkSession) {

  graft.functions.TajoFunctions.register(spark)

  /** Tajo storage format name -> Spark datasource. */
  private val formatMap = Map(
    "text" -> "csv", "csv" -> "csv", "json" -> "json",
    "parquet" -> "parquet", "orc" -> "orc", "avro" -> "avro")

  /** Tajo table property -> Spark datasource option
    * (reference: tajo-common/src/main/java/org/apache/tajo/storage/StorageConstants.java:38-46). */
  private val propMap = Map(
    "text.delimiter" -> "sep",
    "text.null" -> "nullValue",
    "text.skip.headerlines" -> "header",
    "timezone" -> "timeZone",
    "compression.codec" -> "compression")

  def sql(statement: String): DataFrame = {
    val s = statement.trim.stripSuffix(";").trim
    val lower = s.toLowerCase

    if (lower.startsWith("set time zone")) {
      val tz = s.substring("set time zone".length).trim.stripPrefix("'").stripSuffix("'")
      spark.conf.set("spark.sql.session.timeZone", tz)
      spark.emptyDataFrame
    } else if (lower.startsWith("set catalog")) {
      // SET CATALOG <db> (SQLParser.g4:53) — Tajo "catalog" = database.
      spark.sql(s"USE ${s.substring("set catalog".length).trim.stripPrefix("'").stripSuffix("'")}")
    } else if (lower.startsWith("reset ")) {
      // RESET <name> (SQLParser.g4:58) — drop a session variable.
      spark.conf.unset(s"graft.session.${s.substring("reset".length).trim}")
      spark.emptyDataFrame
    } else if (lower.startsWith("set session")) {
      // SET SESSION key TO value | SET SESSION key = value
      val rest = s.substring("set session".length).trim
      val parts = rest.split("(?i)\\s+to\\s+|\\s*=\\s*", 2)
      spark.conf.set(s"graft.session.${parts(0).trim}",
        parts.lift(1).map(_.trim.stripPrefix("'").stripSuffix("'")).getOrElse("true"))
      spark.emptyDataFrame
    } else if (lower.startsWith("create index") || lower.startsWith("drop index")) {
      // BSTIndexScanExec/StoreIndexExec have no Spark counterpart
      // (documented gap, SURVEY.md §2.1) — fail loudly, not silently.
      throw new UnsupportedOperationException(
        "CREATE/DROP INDEX is not supported: Spark has no persisted secondary " +
        "indexes; use bucketing or sorted parquet instead")
    } else if (lower.startsWith("explain global")) {
      explainDF(s.substring("explain global".length), extended = true)
    } else if (lower.startsWith("explain")) {
      explainDF(s.substring("explain".length), extended = false)
    } else {
      spark.sql(rewriteDdl(s))
    }
  }

  private def explainDF(query: String, extended: Boolean): DataFrame = {
    import scala.jdk.CollectionConverters._
    val qe = spark.sql(rewriteDdl(query.trim)).queryExecution
    val text = if (extended) qe.explainString(org.apache.spark.sql.execution.ExtendedMode)
               else qe.explainString(org.apache.spark.sql.execution.SimpleMode)
    spark.createDataFrame(
      text.split("\n").toSeq.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("plan", org.apache.spark.sql.types.StringType))))
  }

  /** Rewrite Tajo DDL clauses to Spark SQL:
    *   USING text WITH ('text.delimiter'='|')  -> USING csv OPTIONS ('sep'='|')
    *   PARTITION BY COLUMN (a, b)              -> PARTITIONED BY (a, b)
    *   CREATE EXTERNAL TABLE                   -> CREATE TABLE (LOCATION implies external)
    */
  private[engine] def rewriteDdl(s: String): String = {
    var out = s
    // format names: USING <fmt>
    out = "(?i)\\bUSING\\s+([a-zA-Z]+)".r.replaceAllIn(out, m => {
      val fmt = m.group(1).toLowerCase
      formatMap.get(fmt) match {
        case Some(sparkFmt) => s"USING $sparkFmt"
        case None if Set("rcfile", "rawfile", "sequencefile", "regex", "hbase").contains(fmt) =>
          throw new UnsupportedOperationException(
            s"storage format '$fmt' is not supported (documented gap, SURVEY.md §2.1)")
        case None => s"USING $fmt"
      }
    })
    // WITH ('k'='v', ...) -> OPTIONS with mapped keys (only after USING)
    out = "(?i)(USING\\s+\\w+\\s+)WITH\\s*\\(([^)]*)\\)".r.replaceAllIn(out, m => {
      val body = "'([^']*)'\\s*=\\s*'([^']*)'".r.findAllMatchIn(m.group(2)).map { kv =>
        val k = propMap.getOrElse(kv.group(1), kv.group(1))
        val v = if (kv.group(1) == "text.skip.headerlines") "true" else kv.group(2)
        s"'$k'='${v.replace("\\", "\\\\")}'"
      }.mkString(", ")
      java.util.regex.Matcher.quoteReplacement(s"${m.group(1)}OPTIONS ($body)")
    })
    // PARTITION BY COLUMN (b TEXT, ...) -> PARTITIONED BY (b, ...), with the
    // typed partition columns appended to the table schema: Tajo declares
    // them OUTSIDE the column list (SQLParser.g4:151-185), Spark inside.
    val pbc = "(?i)PARTITION\\s+BY\\s+COLUMN\\s*\\(([^)]*)\\)".r
    pbc.findFirstMatchIn(out).foreach { m =>
      val decls = m.group(1).split(",").map(_.trim).filter(_.nonEmpty)
      val typed = decls.filter(_.split("\\s+").length >= 2)
      val names = decls.map(_.split("\\s+")(0))
      if (typed.length == decls.length && typed.nonEmpty) {
        // append typed decls to the schema column list (the '(...)' right
        // before USING), then keep only names in PARTITIONED BY
        val schemaRe = "(?is)(CREATE\\s+TABLE(?:\\s+IF\\s+NOT\\s+EXISTS)?\\s+\\S+\\s*\\()([^)]*)(\\))".r
        out = schemaRe.replaceAllIn(out, sm => java.util.regex.Matcher.quoteReplacement(
          sm.group(1) + sm.group(2) + ", " + mapTypes(typed).mkString(", ") + sm.group(3)))
      }
      out = pbc.replaceAllIn(out, java.util.regex.Matcher.quoteReplacement(
        s"PARTITIONED BY (${names.mkString(", ")})"))
    }
    // CREATE EXTERNAL TABLE -> CREATE TABLE (Spark treats LOCATION as external)
    out = "(?i)CREATE\\s+EXTERNAL\\s+TABLE".r.replaceAllIn(out, "CREATE TABLE")
    // Tajo type keywords in DDL column lists (SURVEY.md §1 mapping)
    if ("(?i)^\\s*CREATE\\s+TABLE".r.findFirstIn(out).nonEmpty) {
      Seq("TEXT" -> "STRING", "INT4" -> "INT", "INT8" -> "BIGINT",
          "INT2" -> "SMALLINT", "INT1" -> "TINYINT",
          "FLOAT4" -> "FLOAT", "FLOAT8" -> "DOUBLE").foreach { case (t, s) =>
        // lookarounds keep quoted option keys like 'text.null' intact
        out = s"(?i)(?<!['.])\\b$t\\b(?!['.])".r.replaceAllIn(out, s)
      }
    }
    // INSERT OVERWRITE INTO t -> INSERT OVERWRITE TABLE t (SQLParser.g4:1607)
    out = "(?i)INSERT\\s+OVERWRITE\\s+INTO\\b".r.replaceAllIn(out, "INSERT OVERWRITE TABLE")
    out
  }

  /** Tajo type names Spark doesn't accept (SURVEY.md §1 mapping). */
  private def mapTypes(decls: Seq[String]): Seq[String] = decls.map { d =>
    val Array(name, tpe @ _*) = d.split("\\s+"): @unchecked
    val t = tpe.mkString(" ").toUpperCase match {
      case "TEXT" => "STRING"
      case "INT4" => "INT"
      case "INT8" => "BIGINT"
      case "FLOAT4" => "FLOAT"
      case "FLOAT8" => "DOUBLE"
      case other => other
    }
    s"$name $t"
  }

  /** Register the driver testdata tables. */
  def mount(dir: String): Unit = Tables.register(spark, dir)
}
