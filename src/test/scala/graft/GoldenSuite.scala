package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftEngine
import graft.tools.{Golden, GoldenResult}

/** Replays the re-authored Tajo-dialect golden corpus end-to-end through
  * GraftEngine.sql and asserts each rendered result set equals its stored
  * .result file — the reference's own definition of correctness
  * (QueryTestCaseBase.runSimpleTests/assertResultSet over queries/<Suite>/
  * <case>.sql vs results/<Suite>/<case>.result).
  *
  * Regenerate result files after an INTENDED behavior change with
  * `sbt "runMain graft.tools.GoldenGen"` and review the diff.
  */
class GoldenSuite extends AnyFunSuite {
  import TestSpark._

  private lazy val engine = {
    val e = new GraftEngine(spark)
    e.mount(sfDir)
    e
  }

  private val allCases = Golden.cases()
  assert(allCases.size >= 40, s"golden corpus unexpectedly small: ${allCases.size}")

  allCases.foreach { case (suite, name, script) =>
    test(s"$suite/$name") {
      val goldenFile = Golden.resultFile(suite, name)
      assert(goldenFile.isFile,
        s"missing golden result $goldenFile — run `sbt \"runMain graft.tools.GoldenGen\"`")
      val golden = new String(Files.readAllBytes(goldenFile.toPath), StandardCharsets.UTF_8)
      GoldenResult.diffText(Golden.rendered(engine, suite, script), golden) match {
        case None => ()
        case Some(d) => fail(s"$suite/$name diverged from golden: $d")
      }
    }
  }
}
