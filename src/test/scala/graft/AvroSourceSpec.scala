package graft

import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.AvroSource
import graft.engine.Tables

class AvroSourceSpec extends AnyFunSuite {
  import TestSpark._

  private val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_avro_test"

  test("all-types round trip: scalars, nulls, date/timestamp, decimal, nested") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("dt", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("dec", DecimalType(12, 3), nullable = true),
      StructField("arr", ArrayType(LongType, containsNull = false), nullable = true),
      StructField("m", MapType(StringType, StringType, valueContainsNull = false), nullable = true),
      StructField("rec", StructType(Seq(
        StructField("a", StringType, nullable = true),
        StructField("n", LongType, nullable = true))), nullable = true)))
    val ts = Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val rows = Seq(
      Row(1L, 7, 1.5f, 2.25, true, "hello", Array[Byte](1, 2, 3),
        Date.valueOf("2024-03-01"), ts, BigDecimal("123456.789"),
        Seq(1L, 2L, 3L), Map("k" -> "v"), Row("x", 9L)),
      Row(2L, null, null, null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

    val dir = s"$tmp/all_types"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    AvroSource.write(df, dir)
    val back = AvroSource.read(spark, dir)

    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val orig = df.collect().sortBy(_.getLong(0)).map(normalize)
    val rt = back.collect().sortBy(_.getLong(0)).map(normalize)
    assert(rt.toSeq == orig.toSeq)
  }

  // binary arrays compare by reference in Row equality — stringify them
  private def normalize(r: Row): Seq[Any] = r.toSeq.map {
    case a: Array[Byte] => a.toSeq
    case d: java.math.BigDecimal => BigDecimal(d)
    case x => x
  }

  test("foreign logical types read: timestamp-millis, local-timestamp-micros, uuid") {
    // files written by OTHER systems carry these annotations; author one
    // with the raw avro API and read it through the source
    import org.apache.avro.{LogicalTypes, Schema => ASchema, SchemaBuilder}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val millis = LogicalTypes.timestampMillis().addToSchema(ASchema.create(ASchema.Type.LONG))
    val localMicros = new org.apache.avro.LogicalType("local-timestamp-micros")
      .addToSchema(ASchema.create(ASchema.Type.LONG))
    val uuid = LogicalTypes.uuid().addToSchema(ASchema.create(ASchema.Type.STRING))
    val rec = SchemaBuilder.record("r").fields()
      .name("tm").`type`(millis).noDefault()
      .name("lt").`type`(localMicros).noDefault()
      .name("u").`type`(uuid).noDefault()
      .endRecord()
    val dir = new java.io.File(s"$tmp/logical"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](rec))
    w.create(rec, new java.io.File(dir, "part-0.avro"))
    val r0 = new GenericData.Record(rec)
    r0.put("tm", 1700000000123L)                       // ms since epoch
    r0.put("lt", 1700000000123456L)                    // micros, zone-less
    r0.put("u", "123e4567-e89b-12d3-a456-426614174000")
    w.append(r0); w.close()
    val df = AvroSource.read(spark, dir.toString)
    assert(df.schema("tm").dataType == TimestampType)
    assert(df.schema("lt").dataType == TimestampNTZType)
    assert(df.schema("u").dataType == StringType)
    val row = df.collect()(0)
    assert(row.getAs[java.sql.Timestamp]("tm").toInstant.toEpochMilli == 1700000000123L)
    assert(row.getAs[java.time.LocalDateTime]("lt") ==
      java.time.LocalDateTime.ofEpochSecond(1700000000L, 123456000, java.time.ZoneOffset.UTC))
    assert(row.getString(2) == "123e4567-e89b-12d3-a456-426614174000")
  }

  test("duration logical type reads as a (months, days, millis) struct") {
    import org.apache.avro.{Schema => ASchema, SchemaBuilder}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    // avro's LogicalTypes registry never parses "duration" — author the
    // fixed(12) with the raw schema property, as foreign writers do
    val dur = ASchema.createFixed("dur12", null, null, 12)
    dur.addProp("logicalType", "duration")
    val rec = SchemaBuilder.record("r").fields()
      .name("d").`type`(dur).noDefault()
      .name("x").`type`().longType().noDefault()
      .endRecord()
    val dir = new java.io.File(s"$tmp/duration"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](rec))
    w.create(rec, new java.io.File(dir, "part-0.avro"))
    val bytes = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(14).putInt(3).putInt(86399999).array() // 14 months, 3 days, 23:59:59.999
    val r0 = new GenericData.Record(rec)
    r0.put("d", new GenericData.Fixed(dur, bytes))
    r0.put("x", 7L)
    w.append(r0); w.close()
    val df = AvroSource.read(spark, dir.toString)
    assert(df.schema("d").dataType.isInstanceOf[StructType])
    val row = df.selectExpr("d.months", "d.days", "d.millis", "x").collect()(0)
    assert((row.getInt(0), row.getInt(1), row.getInt(2), row.getLong(3)) == ((14, 3, 86399999, 7L)))
  }

  test("supplier table round trips losslessly at one file per partition") {
    val src = Tables.table(spark, sfDir, "supplier").repartition(3)
    val dir = s"$tmp/supplier"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    AvroSource.write(src, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) == 3)
    val back = AvroSource.read(spark, dir)
    assert(back.rdd.getNumPartitions == 3) // one task per container file
    val a = src.orderBy("s_suppkey").collect().map(_.toSeq)
    val b = back.orderBy("s_suppkey").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
