package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.ExplainGolden

/** Plan-shape goldens for the headline queries (see [[ExplainGolden]]):
  * the normalized physical-plan fingerprint must match the stored file
  * byte-for-byte. A legitimate plan improvement regenerates the golden
  * (`runMain graft.tools.ExplainGoldenGen`) and the diff is reviewed like
  * any other behavior change; a silent regression fails here first. */
class GoldenExplainSuite extends AnyFunSuite {
  import TestSpark._

  ExplainGolden.queries.foreach { name =>
    test(s"explain-golden/$name") {
      val q = SparkEntry.registry.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      val got = ExplainGolden.fingerprint(q.run(spark, sfDir))
      val want = ExplainGolden.read(name)
      assert(got == want,
        s"\nplan fingerprint drift for $name —\nGOT:\n$got\nWANT:\n$want")
    }
  }
}
