package graft

import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  import TestSpark._

  // Queries whose computation is not expressible as one DuckDB statement —
  // the driver contract records a rows-only check for these. Adding a name
  // here must be a conscious decision: everything else MUST carry an oracle.
  // Empty since r5: even the iterative BPE training loop replays in DuckDB
  // (8 unrolled CTE rounds over the vocab table) — 100% oracle coverage.
  private val oracleExempt = Set.empty[String]

  test("registry has unique names and every query declares an oracle") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    val noOracle = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == oracleExempt, s"oracle coverage drifted: $noOracle")
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("flagship q1_agg returns the 6 flag/status groups") {
    val r = SparkEntry.queries("q1_agg")(spark, sfDir).collect()
    assert(r.length == 6)
    assert(r.map(_.getString(0)).distinct.sorted.sameElements(Array("A", "N", "R")))
  }

  test("oracle SQL declared for every non-exempt query name") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet -- oracleExempt)
  }

  test("driver entry() smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("golden result rendering matches the reference conventions") {
    import spark.implicits._
    val df = Seq((1L, Some(true), Option.empty[String]), (2L, Some(false), Some("x")))
      .toDF("k", "b", "s")
    val txt = graft.tools.GoldenResult.render(df.orderBy("k"))
    assert(txt ==
      s"""k,b,s
         |${graft.tools.GoldenResult.Separator}
         |1,t,null
         |2,f,x
         |""".stripMargin)
    assert(graft.tools.GoldenResult.diff(df.orderBy("k"), txt).isEmpty)
    assert(graft.tools.GoldenResult.diff(df.orderBy("k"), txt.replace("2,f,x", "2,t,x")).nonEmpty)
  }

  test("headline set is non-empty and resolvable") {
    assert(SparkEntry.headlines.nonEmpty)
    assert(SparkEntry.headlines.forall(SparkEntry.queries.contains))
  }
}
