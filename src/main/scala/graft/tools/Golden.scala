package graft.tools

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.engine.GraftEngine
import org.apache.spark.sql.DataFrame

/** Golden-file query corpus: Tajo-dialect scripts replayed end-to-end
  * through [[graft.engine.GraftEngine.sql]] and diffed against stored
  * result files — the same correctness contract as the reference's
  * QueryTestCaseBase harness (reference: tajo-cluster-tests/src/test/java/
  * org/apache/tajo/QueryTestCaseBase.java:132-146 naming contract, :573
  * runSimpleTests, :734-760 assertResultSet over a 683-script corpus).
  *
  * Layout mirrors the reference's convention, with re-authored (not
  * copied) cases:
  *
  *   src/test/resources/golden/queries/<Suite>/<case>.sql
  *   src/test/resources/golden/results/<Suite>/<case>.result
  *
  * A script may hold several ';'-separated statements (DDL setup, SET
  * commands); the LAST statement's result set is what is rendered and
  * compared, matching the reference harness's behavior.
  */
object Golden {

  val queriesDir = "src/test/resources/golden/queries"
  val resultsDir = "src/test/resources/golden/results"

  /** (suite, case name, sql text) for every authored case, sorted. */
  def cases(): Seq[(String, String, String)] = {
    val root = new File(queriesDir)
    require(root.isDirectory, s"golden corpus missing: $queriesDir")
    for {
      suite <- root.listFiles().filter(_.isDirectory).sortBy(_.getName).toSeq
      sql <- suite.listFiles().filter(_.getName.endsWith(".sql")).sortBy(_.getName).toSeq
    } yield (suite.getName, sql.getName.stripSuffix(".sql"),
      new String(Files.readAllBytes(sql.toPath), StandardCharsets.UTF_8))
  }

  private val dropIfExists = "(?i)^DROP\\s+TABLE\\s+IF\\s+EXISTS\\s+([\\w.`\"]+)$".r

  /** Run one script: execute every ';'-separated statement, return the
    * last statement's DataFrame.
    *
    * A `DROP TABLE IF EXISTS` also clears an orphaned managed-table
    * directory left in the warehouse by a previous JVM (whose catalog
    * entry died with its session) — the script-replay equivalent of the
    * reference harness's per-run cluster reset; without it a re-run hits
    * LOCATION_ALREADY_EXISTS on CREATE. */
  def run(engine: GraftEngine, script: String): DataFrame = {
    val stmts = splitStatements(script)
    require(stmts.nonEmpty, "empty golden script")
    runSetup(engine, stmts.init)
    engine.sql(stmts.last)
  }

  private def runSetup(engine: GraftEngine, setup: Seq[String]): Unit =
    setup.foreach { st =>
      dropIfExists.findFirstMatchIn(st).foreach { m =>
        // strip both quote styles and lowercase: Spark lowercases managed-
        // table directory names, so `"MANAGED_CTAS1"` lives at managed_ctas1
        val parts = m.group(1).split("\\.")
          .map(_.stripPrefix("`").stripSuffix("`")
            .stripPrefix("\"").stripSuffix("\"").toLowerCase)
        val qualified = parts.mkString(".")
        val exists = scala.util.Try(engine.spark.catalog.tableExists(qualified)).getOrElse(false)
        if (!exists) {
          val wh = engine.spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
          // tables in the default database live directly under the
          // warehouse root, not under a default.db/ subdirectory
          val dir = if (parts.length == 2 && !parts(0).equalsIgnoreCase("default"))
                      new File(new File(wh, parts(0) + ".db"), parts(1))
                    else new File(wh, parts.last)
          org.apache.commons.io.FileUtils.deleteQuietly(dir)
        }
      }
      engine.sql(st)
    }

  /** Split on statement-terminating semicolons only: a ';' inside a
    * single-quoted, backquoted or double-quoted literal is data, and
    * everything after an (unquoted) `--` to end-of-line is comment — a
    * quote or ';' inside a comment must not derail the scan. */
  private[tools] def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var quote = 0.toChar
    var start = 0
    var i = 0
    while (i < script.length) {
      val c = script.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0.toChar }
      else if (c == '-' && i + 1 < script.length && script.charAt(i + 1) == '-') {
        while (i < script.length && script.charAt(i) != '\n') i += 1
      } else c match {
        case '\'' | '`' | '"' => quote = c
        case ';' => out += script.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += script.substring(start)
    out.result()
      .map(_.linesIterator
        .dropWhile(l => l.trim.isEmpty || l.trim.startsWith("--"))
        .mkString("\n").trim)
      .filter(_.nonEmpty)
  }

  def resultFile(suite: String, name: String): File =
    Paths.get(resultsDir, suite, s"$name.result").toFile

  /** Suites whose cases may END with a statement EXPECTED to fail — the
    * reference's TestQueryValidation asserts error classes, not result sets
    * (reference: tajo-core-tests/src/test/java/org/apache/tajo/engine/
    * query/TestQueryValidation.java assertInvalidSQL). For these suites a
    * failing last statement renders as an ERROR pseudo-result carrying the
    * stable Spark error condition (or exception class name), so invalid-SQL
    * behavior is pinned by the same golden-diff machinery. Other suites
    * still abort loudly on any failure. */
  val errorSuites: Set[String] =
    Set("TestQueryValidation", "TestSQLAnalyzer", "TestCreateTable", "TestAlterTable")

  def renderError(e: Throwable): String = {
    val token = e match {
      case a: org.apache.spark.sql.AnalysisException =>
        Option(a.getCondition).getOrElse(a.getClass.getSimpleName)
      case other => other.getClass.getSimpleName
    }
    Seq("ERROR", GoldenResult.Separator, token).mkString("", "\n", "\n")
  }

  /** Render one case: normal result text, or — in an [[errorSuites]] suite
    * — the ERROR pseudo-result when the LAST statement fails. Setup
    * statements abort loudly even in error suites: a broken fixture must
    * not silently pin as an expected-error case. */
  def rendered(engine: GraftEngine, suite: String, script: String): String =
    if (errorSuites(suite)) {
      val stmts = splitStatements(script)
      require(stmts.nonEmpty, "empty golden script")
      runSetup(engine, stmts.init)
      try GoldenResult.render(engine.sql(stmts.last))
      catch {
        case scala.util.control.NonFatal(e) =>
          // the result pins only the stable error token; the full message
          // goes to stderr so an authoring run can tell WHICH statement died
          System.err.println(
            s"[golden] error case detail: ${e.toString.replaceAll("\\s+", " ").take(400)}")
          renderError(e)
      }
    } else GoldenResult.render(run(engine, script))

  /** Regenerate every .result file from the current engine output.
    * Usage: runMain graft.tools.GoldenGen [sfDir] [suiteFilter]
    * A suite filter regenerates only matching suites (substring match) —
    * for fast iteration while authoring; a full run before commit still
    * validates there are no unexpected cross-suite diffs.
    * Review the diff before committing — these files define expected
    * behavior, the generator only snapshots it. */
  def generate(sfDir: String, suiteFilter: Option[String] = None): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .appName("golden-gen")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new GraftEngine(spark)
    engine.mount(sfDir)
    cases().filter(c => suiteFilter.forall(c._1.contains)).foreach { case (suite, name, script) =>
      val out = resultFile(suite, name)
      out.getParentFile.mkdirs()
      Files.write(out.toPath,
        rendered(engine, suite, script).getBytes(StandardCharsets.UTF_8))
      println(s"[golden] wrote $suite/$name.result")
    }
    spark.stop()
  }
}

object GoldenGen {
  def main(args: Array[String]): Unit =
    Golden.generate(args.headOption.getOrElse("/root/testdata/sf0.001"), args.lift(1))
}
