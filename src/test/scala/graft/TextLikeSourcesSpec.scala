package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.{RegexTextSource, SequenceFileSource}

class TextLikeSourcesSpec extends AnyFunSuite {
  import TestSpark._

  private val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_textlike_test"

  test("sequencefile round trips delimited rows including nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "alpha", 1.5), Row(2L, null, 2.25), Row(3L, "gamma", null)), 2),
      schema)
    val dir = s"$tmp/seq"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    SequenceFileSource.write(df, dir)
    val back = SequenceFileSource.read(spark, dir, schema)
    val a = df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = back.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.sameElements(b))
  }

  test("rcfile round trips typed rows including nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "alpha", 1.5), Row(2L, null, 2.25), Row(3L, "gamma", null)), 2),
      schema)
    val dir = s"$tmp/rc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    graft.sources.RCFileSource.write(df, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".rc")) == 2)
    val back = graft.sources.RCFileSource.read(spark, dir, schema)
    val a = df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = back.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.sameElements(b))
  }

  test("regex text source extracts capture groups; non-matching lines are all-NULL") {
    val dir = s"$tmp/regex"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    import spark.implicits._
    Seq("10|alice|3.5", "20|bob|4.25", "garbage line").toDF("value")
      .write.text(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("who", StringType),
      StructField("score", DoubleType)))
    val got = RegexTextSource.read(spark, dir,
      "^(\\d+)\\|([^|]*)\\|([0-9.]+)$", schema)
      .collect().map(_.toSeq).sortBy(s => Option(s.head).map(_.asInstanceOf[Long]).getOrElse(-1L))
    assert(got.toSeq == Seq(
      Seq(null, null, null),
      Seq(10L, "alice", 3.5),
      Seq(20L, "bob", 4.25)))
  }
}
