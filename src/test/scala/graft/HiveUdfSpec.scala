package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.functions.HiveUdf

class HiveUdfSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("classic UDF registers with inferred return type and computes (Text -> Text)") {
    val rt = HiveUdf.register(spark, "hv_reverse_t", "org.apache.hadoop.hive.ql.udf.UDFReverse")
    assert(rt == StringType)
    val r = spark.sql("SELECT hv_reverse_t('spark') AS x").collect()
    assert(r(0).getString(0) == "kraps")
  }

  test("two-arg evaluate with writable conversion (Text, IntWritable)") {
    HiveUdf.register(spark, "hv_repeat_t", "org.apache.hadoop.hive.ql.udf.UDFRepeat")
    val r = spark.sql("SELECT hv_repeat_t('ab', 3) AS x").collect()
    assert(r(0).getString(0) == "ababab")
  }

  test("IntWritable return type maps to IntegerType and NULL passes through") {
    val rt = HiveUdf.register(spark, "hv_ascii_t", "org.apache.hadoop.hive.ql.udf.UDFAscii")
    assert(rt == IntegerType)
    val r = spark.sql("SELECT hv_ascii_t('xyz') AS a, hv_ascii_t(CAST(NULL AS STRING)) AS n").collect()
    assert(r(0).getInt(0) == 120)
    assert(r(0).isNullAt(1))
  }

  test("LongWritable parameter accepts BIGINT (bin)") {
    HiveUdf.register(spark, "hv_bin_t", "org.apache.hadoop.hive.ql.udf.UDFBin")
    val r = spark.sql("SELECT hv_bin_t(CAST(5 AS BIGINT)) AS b").collect()
    assert(r(0).getString(0) == "101")
  }

  test("overload selection prefers the Text signature (hex)") {
    HiveUdf.register(spark, "hv_hex_t", "org.apache.hadoop.hive.ql.udf.UDFHex")
    val r = spark.sql("SELECT hv_hex_t('z') AS h").collect()
    assert(r(0).getString(0) == "7A")
  }

  test("namesOf follows the reference: @Description aliases else dotted class name") {
    val cls = Class.forName("org.apache.hadoop.hive.ql.udf.UDFReverse")
    assert(HiveUdf.namesOf(cls).contains("reverse"))
    // a class with no @Description would fall back to underscored FQCN
    assert(HiveUdf.namesOf(classOf[java.lang.String]) == Seq("java_lang_String"))
  }

  test("registration works across task threads (thread-local instances)") {
    HiveUdf.register(spark, "hv_rev_mt", "org.apache.hadoop.hive.ql.udf.UDFReverse")
    val df = (1 to 2000).map(i => s"value$i").toDF("s").repartition(8)
    df.createOrReplaceTempView("hv_mt")
    val bad = spark.sql("SELECT s, hv_rev_mt(s) AS r FROM hv_mt")
      .where("reverse(s) <> r").count()
    assert(bad == 0)
  }

  test("GenericUDF registers with OI-derived return type (upper)") {
    val rt = HiveUdf.registerGeneric(spark, "hv_upper_g",
      "org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper", Seq(StringType))
    assert(rt == StringType)
    val r = spark.sql("SELECT hv_upper_g('spark') AS x, hv_upper_g(CAST(NULL AS STRING)) AS n").collect()
    assert(r(0).getString(0) == "SPARK")
    assert(r(0).isNullAt(1))
  }

  test("GenericUDF with two arguments (concat) computes across rows") {
    HiveUdf.registerGeneric(spark, "hv_concat_g",
      "org.apache.hadoop.hive.ql.udf.generic.GenericUDFConcat",
      Seq(StringType, StringType))
    val df = (1 to 100).map(i => (s"a$i", s"b$i")).toDF("x", "y").repartition(4)
    df.createOrReplaceTempView("hv_gen_t")
    val bad = spark.sql("SELECT x, y, hv_concat_g(x, y) AS c FROM hv_gen_t")
      .where("concat(x, y) <> c").count()
    assert(bad == 0)
  }

  test("GenericUDF integer return (instr)") {
    val rt = HiveUdf.registerGeneric(spark, "hv_instr_g",
      "org.apache.hadoop.hive.ql.udf.generic.GenericUDFInstr",
      Seq(StringType, StringType))
    assert(rt == IntegerType)
    val r = spark.sql("SELECT hv_instr_g('spark sql', 'sql') AS p").collect()
    assert(r(0).getInt(0) == 7)
  }

  test("engine session knob tajo.function.hive.jar-dir loads a jar directory") {
    // isolated session: parity names (reverse, ascii, ...) shadow builtins
    val s2 = spark.newSession()
    val engine = new graft.engine.GraftEngine(s2)
    val dir = java.nio.file.Files.createTempDirectory("graft-hiveudf-jars")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("hive-exec-core.jar"),
      java.nio.file.Paths.get("/opt/spark/jars/hive-exec-2.3.10-core.jar"))
    engine.sql(s"SET SESSION tajo.function.hive.jar-dir TO '$dir'")
    assert(s2.sql("SELECT space(3) AS s").collect()(0).getString(0) == "   ")
    assert(s2.sql("SELECT bin(5) AS b").collect()(0).getString(0) == "101")
  }

  test("loadJar scans a jar and registers UDFs under reference-parity names") {
    val s2 = spark.newSession() // isolated registry: parity names may shadow builtins
    val loaded = HiveUdf.loadJar(s2, "/opt/spark/jars/hive-exec-2.3.10-core.jar",
      packagePrefix = "org.apache.hadoop.hive.ql.udf")
    val names = loaded.map(_._1).toSet
    assert(names.contains("reverse") && names.contains("ascii"))
    assert(s2.sql("SELECT reverse('abc') AS x").collect()(0).getString(0) == "cba")
  }
}
