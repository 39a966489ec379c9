package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.RawFileSource

class RawFileSourceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("b", BooleanType), StructField("s", ShortType),
    StructField("i", IntegerType), StructField("l", LongType),
    StructField("f", FloatType), StructField("d", DoubleType),
    StructField("t", StringType), StructField("bin", BinaryType),
    StructField("dt", DateType), StructField("ts", TimestampType)))

  test("row encoding matches the reference layout (offsets, LE, julian epochs)") {
    val row = Row(true, 7.toShort, 42, 9L, 1.5f, 2.25,
      "ab", Array[Byte](1, 2, 3), Date.valueOf("2000-01-01"),
      Timestamp.from(java.time.Instant.parse("2000-01-01T00:00:00Z")))
    val bytes = RawFileSource.encodeRow(row, schema)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerSize = 4 + 4 * 10
    assert(buf.getInt() == bytes.length)           // row length includes header
    assert(buf.getInt() == headerSize)             // first field offset
    buf.position(4 + 4 * 9)                        // last field offset
    val tsOff = buf.getInt()
    // julian date: 2000-01-01 = POSTGRES_EPOCH_JDATE = 2451545
    buf.position(4 + 4 * 8)
    val dtOff = buf.getInt()
    buf.position(dtOff)
    assert(buf.getInt() == 2451545)
    // julian micros: 2000-01-01T00:00:00Z = 0
    buf.position(tsOff)
    assert(buf.getLong() == 0L)
  }

  test("null fields write offset -1 and no data") {
    val row = Row(null, null, null, null, null, null, null, null, null, null)
    val bytes = RawFileSource.encodeRow(row, schema)
    assert(bytes.length == 4 + 4 * 10)             // header only
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.getInt()
    (1 to 10).foreach(_ => assert(buf.getInt() == -1))
  }

  test("round trip preserves every supported type and NULLs across partitions") {
    val rows = Seq(
      Row(true, 1.toShort, 10, 100L, 1.5f, 2.5, "hello", Array[Byte](9),
        Date.valueOf("1970-01-01"), Timestamp.from(java.time.Instant.parse("2026-08-13T12:34:56.789Z"))),
      Row(false, -2.toShort, -20, -200L, -1.5f, -2.5, "", Array[Byte](),
        Date.valueOf("2024-02-29"), Timestamp.from(java.time.Instant.parse("1969-12-31T23:59:59.000123Z"))),
      Row(null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-rawfile").toString
    RawFileSource.write(df, dir)
    val back = RawFileSource.read(spark, dir, schema)
    def render(r: Row): String = r.toSeq.map {
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case v => String.valueOf(v)
    }.mkString("|")
    val a = df.collect().map(render).sorted.toSeq
    val b = back.collect().map(render).sorted.toSeq
    assert(a == b)
    // binary column round trip (toString hides bytes)
    val origBin = df.where("t = 'hello'").collect()(0).getAs[Array[Byte]]("bin").toSeq
    val backBin = back.where("t = 'hello'").collect()(0).getAs[Array[Byte]]("bin").toSeq
    assert(origBin == backBin)
  }

  test("property: random rows of every type round trip bit-exactly (seeded)") {
    val rnd = new scala.util.Random(4242)
    def randRow(): Row = {
      def opt[A](v: => A): Any = if (rnd.nextInt(5) == 0) null else v
      Row(
        opt(rnd.nextBoolean()),
        opt(rnd.nextInt().toShort),
        opt(rnd.nextInt()),
        opt(rnd.nextLong()),
        opt(java.lang.Float.intBitsToFloat(rnd.nextInt())),
        opt(java.lang.Double.longBitsToDouble(rnd.nextLong())),
        opt(rnd.alphanumeric.take(rnd.nextInt(40)).mkString),
        opt(Array.fill(rnd.nextInt(20))(rnd.nextInt().toByte)),
        opt(Date.valueOf(java.time.LocalDate.ofEpochDay(rnd.between(-100000L, 100000L)))),
        opt(Timestamp.from(java.time.Instant.ofEpochSecond(
          rnd.between(-30610224000L, 32503680000L), rnd.nextInt(1000000) * 1000L))))
    }
    // NaN bit patterns come out of intBitsToFloat; compare via raw bits
    def renderBits(r: Row): String = r.toSeq.map {
      case f: Float => java.lang.Float.floatToRawIntBits(f).toString
      case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case v => String.valueOf(v)
    }.mkString("|")
    val rows = Seq.fill(300)(randRow())
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-rawfile-prop").toString
    RawFileSource.write(df, dir)
    val back = RawFileSource.read(spark, dir, schema)
    assert(back.collect().map(renderBits).sorted.toSeq ==
      df.collect().map(renderBits).sorted.toSeq)
  }

  test("round trip of a real table keeps every row (nation)") {
    val nation = graft.engine.Tables.table(spark, sfDir, "nation")
    val dir = java.nio.file.Files.createTempDirectory("graft-rawfile-nation").toString
    RawFileSource.write(nation.repartition(4), dir)
    val back = RawFileSource.read(spark, dir, nation.schema)
    assert(back.count() == nation.count())
    assert(back.except(nation).count() == 0 && nation.except(back).count() == 0)
    // one file per write partition, the reference's fragment model
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".raw")) == 4)
  }
}
