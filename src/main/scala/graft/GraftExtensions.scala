package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark extensions entry point: makes the library's native Catalyst
  * expressions (`norm_text`, `minhash_sig`, `simhash32`, `vec_dot`,
  * `lsh_bucket`, `ngram_hash_set`) available in EVERY session of a cluster
  * without calling [[graft.functions.TajoFunctions.register]] — the
  * idiomatic deployment for a shared Spark installation:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * (The full Tajo compat surface — to_char, strpos(b), digest, geoip, … —
  * uses Scala-UDF registration, which is per-session by design; call
  * `new GraftEngine(spark)` or `TajoFunctions.register(spark)` for those.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.NativeExprs.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
