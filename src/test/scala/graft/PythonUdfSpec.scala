package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.PythonUdf

class PythonUdfSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Authored fixture exercising the reference's script surface:
    * decorated scalars of each type family, an undecorated (blob) def,
    * and a two-stage aggregate class. */
  private val scriptSrc =
    """from tajo_util import output_type
      |
      |@output_type('int8')
      |def py_add(a, b):
      |    if a is None or b is None:
      |        return None
      |    return a + b
      |
      |@output_type('text')
      |def py_shout(s):
      |    if s is None:
      |        return None
      |    return s.upper() + '!'
      |
      |@output_type('float8')
      |def py_ratio(num, total):
      |    return num * 100 / float(total)
      |
      |@output_type('int4')
      |def py_answer():
      |    return 42
      |
      |def py_echo(s):
      |    return s
      |
      |class SumCountPy:
      |    def __init__(self):
      |        self.reset()
      |    def reset(self):
      |        self.s = 0
      |        self.n = 0
      |    def eval(self, x):
      |        if x is not None:
      |            self.s += x
      |            self.n += 1
      |    def get_partial_result(self):
      |        return [self.s, self.n]
      |    def merge(self, p):
      |        if p:
      |            self.s += p[0]
      |            self.n += p[1]
      |    @output_type('float8')
      |    def get_final_result(self):
      |        if self.n == 0:
      |            return None
      |        return self.s / float(self.n)
      |""".stripMargin

  private lazy val scriptPath: String = {
    val f = Files.createTempFile("graft-pyudf-spec", ".py")
    Files.write(f, scriptSrc.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("parseScript discovers scalars, types, arities, and the aggregate class") {
    val (funcs, aggs) = PythonUdf.parseScript(scriptSrc)
    val byName = funcs.map(f => f.name -> f).toMap
    assert(byName("py_add").paramCount == 2 && byName("py_add").returnType == LongType)
    assert(byName("py_shout").returnType == StringType)
    assert(byName("py_ratio").returnType == DoubleType)
    assert(byName("py_answer").paramCount == 0 && byName("py_answer").returnType == IntegerType)
    assert(byName("py_echo").returnType == BinaryType) // undecorated -> blob default
    assert(aggs == Seq(PythonUdf.PyAgg("SumCountPy", 1, DoubleType)))
  }

  test("registered scalar udfs compute through SQL with correct types and NULLs") {
    val names = PythonUdf.registerScript(spark, scriptPath)
    assert(names.toSet ==
      Set("py_add", "py_shout", "py_ratio", "py_answer", "py_echo", "sumcountpy"))
    val df = Seq((1, 2, "ab"), (3, 4, "cd")).toDF("a", "b", "s")
    df.createOrReplaceTempView("pyudf_t")
    val r = spark.sql(
      """SELECT py_add(a, b) AS ad, py_shout(s) AS sh, py_ratio(a, b) AS ra,
        |       py_answer() AS an, py_add(a, CAST(NULL AS INT)) AS nl
        |FROM pyudf_t ORDER BY a""".stripMargin).collect()
    assert(r(0).getLong(0) == 3L && r(1).getLong(0) == 7L)
    assert(r(0).getString(1) == "AB!" && r(1).getString(1) == "CD!")
    assert(math.abs(r(0).getDouble(2) - 50.0) < 1e-12)
    assert(r(0).getInt(3) == 42)
    assert(r(0).isNullAt(4))
  }

  test("undecorated def returns blob (binary), the reference default") {
    PythonUdf.registerScript(spark, scriptPath)
    val r = spark.sql("SELECT py_echo('xyz') AS b").collect()
    assert(new String(r(0).getAs[Array[Byte]](0), StandardCharsets.UTF_8) == "xyz")
  }

  test("mapColumn batched path matches the scalar SQL path") {
    PythonUdf.registerScript(spark, scriptPath)
    val docs = (1 to 500).map(i => (i.toLong, s"doc$i")).toDF("id", "t")
    val batched = PythonUdf.mapColumn(docs, scriptPath, "py_shout", StringType,
      Seq("t"), "sh", batchSize = 64)
    docs.createOrReplaceTempView("pyudf_docs")
    val viaSql = spark.sql("SELECT id, py_shout(t) AS sh FROM pyudf_docs")
    assert(batched.select("id", "sh").except(viaSql).count() == 0)
    assert(viaSql.except(batched.select("id", "sh")).count() == 0)
  }

  test("two-stage python aggregate matches the Spark-native aggregation") {
    val df = (1 to 1000).map(i => (i % 7, i)).toDF("g", "x").repartition(8)
    val got = PythonUdf.aggregate(df, scriptPath,
        PythonUdf.PyAgg("SumCountPy", 1, DoubleType),
        groupCols = Seq("g"), inputCols = Seq("x"), resultCol = "avg_x")
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1)))
    val want = df.groupBy("g").agg((sum("x") / count("x")).as("avg_x"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("aggregate class registers as a SQL function named classname.toLowerCase") {
    PythonUdf.registerScript(spark, scriptPath)
    val df = (1 to 200).map(i => (i % 4, i)).toDF("g", "x").repartition(8)
    df.createOrReplaceTempView("py_udaf_sql_t")
    val got = spark.sql(
        "SELECT g, sumcountpy(x) AS avg_x FROM py_udaf_sql_t GROUP BY g ORDER BY g")
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    val want = df.groupBy("g").agg((sum("x") / count("x")).as("avg_x"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
    // empty-group final: fresh instance, python returns None -> SQL NULL
    val none = spark.sql("SELECT sumcountpy(CAST(NULL AS DOUBLE)) AS v FROM py_udaf_sql_t").collect()
    assert(none(0).isNullAt(0))
  }

  test("multi-argument python aggregate (weighted mean) matches Spark") {
    val src =
      """from tajo_util import output_type
        |
        |class WeightedMeanPy:
        |    def __init__(self):
        |        self.ws = 0
        |        self.wx = 0
        |    def eval(self, x, w):
        |        if x is not None and w is not None:
        |            self.ws += w
        |            self.wx += x * w
        |    def get_partial_result(self):
        |        return [self.wx, self.ws]
        |    def merge(self, p):
        |        if p:
        |            self.wx += p[0]
        |            self.ws += p[1]
        |    @output_type('float8')
        |    def get_final_result(self):
        |        return None if self.ws == 0 else self.wx / float(self.ws)
        |""".stripMargin
    val f = Files.createTempFile("graft-pyudaf-wm", ".py")
    Files.write(f, src.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    val df = (1 to 500).map(i => (i % 5, i, (i % 7) + 1)).toDF("g", "x", "w").repartition(8)
    val got = PythonUdf.aggregate(df, f.toString,
        PythonUdf.PyAgg("WeightedMeanPy", 2, DoubleType),
        Seq("g"), Seq("x", "w"), "wm")
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1)))
    // integer sums stay exact in python; one division — bit-comparable
    val want = df.groupBy("g")
      .agg((sum(expr("CAST(x AS BIGINT) * w")).cast("double") / sum("w")).as("wm"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("a raising python function fails the query loudly and the worker survives") {
    val src =
      """from tajo_util import output_type
        |
        |@output_type('int4')
        |def py_boom(x):
        |    if x == 13:
        |        raise ValueError('unlucky')
        |    return x
        |""".stripMargin
    val f = Files.createTempFile("graft-pyudf-boom", ".py")
    Files.write(f, src.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    PythonUdf.registerScript(spark, f.toString)
    val e = intercept[Exception](spark.sql("SELECT py_boom(13)").collect())
    assert(e.getMessage.contains("unlucky") ||
      Option(e.getCause).exists(_.getMessage.contains("unlucky")))
    // the worker catches exceptions and keeps serving: same session, same
    // thread pool, next call must succeed without a respawn
    assert(spark.sql("SELECT py_boom(7) AS x").collect()(0).getInt(0) == 7)
  }

  test("aggregate handles empty partitions and all-null input") {
    val df = Seq((1, null.asInstanceOf[Integer]), (1, null.asInstanceOf[Integer]))
      .toDF("g", "x").repartition(8)
    val r = PythonUdf.aggregate(df, scriptPath,
      PythonUdf.PyAgg("SumCountPy", 1, DoubleType),
      Seq("g"), Seq("x"), "avg_x").collect()
    assert(r.length == 1 && r(0).isNullAt(1))
  }
}
