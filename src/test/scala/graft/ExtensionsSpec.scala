package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path: a session created with
  * GraftExtensions resolves the native expressions with NO
  * TajoFunctions.register call. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects the native expressions into a new session") {
    val prev = TestSpark.spark // ensures the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions runs the same (SparkSessionExtensions => Unit) the
    // spark.sql.extensions conf invokes at submit time; reuses prev's
    // SparkContext but builds a NEW session with the injections applied
    val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
    try {
      assert(s2 ne prev)
      val r = s2.sql(
        """SELECT norm_text('  Hello, World!  42 ') AS n,
          |  vec_dot(ARRAY(1.0D, 2.0D), ARRAY(3.0D, 4.0D)) AS d,
          |  SIZE(minhash_sig('a b c d', 16, 3)) AS sig_len,
          |  lsh_bucket(ARRAY(1.0D), 4, 1) AS b""".stripMargin).collect()(0)
      assert(r.getString(0) == "hello world 42")
      assert(r.getDouble(1) == 11.0)
      assert(r.getInt(2) == 16)
      assert(r.getInt(3) >= 0 && r.getInt(3) < 16)
    } finally {
      // never s2.stop(): it shares the suite-wide SparkContext
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
