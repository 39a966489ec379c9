package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on the avro-core jars
  * that ship with Spark — the spark-avro *connector* is not in this
  * container, but the format itself is fully public (reference reads and
  * writes the same container files: tajo-storage/tajo-storage-hdfs/src/
  * main/java/org/apache/tajo/storage/avro/AvroScanner.java,
  * AvroAppender.java).
  *
  * Read path: one Spark partition per .avro container file — each task
  * opens its file through `FsInput` (seekable, so Avro's sync-marker
  * blocks stream without loading the file in memory) and decodes
  * GenericRecords straight to Rows. At scale the parallelism is the file
  * count, which is what the reference's scanner gives too (its splits are
  * per-file for Avro); writers control file sizing via the write-side
  * partition count.
  *
  * Write path: one container file per partition via DataFileWriter —
  * append-streamed, no driver collect anywhere.
  *
  * Type mapping (both directions): boolean/int/long/float/double/string/
  * bytes/enum + nullable unions, record -> STRUCT, array -> ARRAY,
  * map -> MAP, logical date -> DATE, timestamp-micros -> TIMESTAMP,
  * decimal(p,s) -> DECIMAL(p,s).
  */
object AvroSource {

  // ------------------------------------------------------- schema: avro->spark

  /** Avro schema -> (Spark type, nullable). */
  def sparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date") (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      Option(s.getLogicalType).map(_.getName) match {
        case Some("timestamp-micros") | Some("timestamp-millis") => (TimestampType, false)
        case Some("local-timestamp-micros") => (TimestampNTZType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.FIXED
        if s.getProp("logicalType") == "duration" && s.getFixedSize == 12 =>
      // Avro duration (spec: 12-byte fixed, three unsigned little-endian
      // ints) has no Spark analog — surface it as a typed struct. Avro's
      // own LogicalTypes registry never parses "duration", so it is
      // detected via the raw schema property. Read-only: Spark structs
      // don't carry the logical-type tag back, so the writer rejects it.
      (StructType(Seq(
        StructField("months", IntegerType, nullable = false),
        StructField("days", IntegerType, nullable = false),
        StructField("millis", IntegerType, nullable = false))), false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.toSeq.map { f =>
        val (dt, nullable) = sparkType(f.schema())
        StructField(f.name(), dt, nullable)
      }), false)
    case Schema.Type.ARRAY =>
      val (dt, nullable) = sparkType(s.getElementType)
      (ArrayType(dt, containsNull = nullable), false)
    case Schema.Type.MAP =>
      val (dt, nullable) = sparkType(s.getValueType)
      (MapType(StringType, dt, valueContainsNull = nullable), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"only [null, T] unions are supported, got $s")
      (sparkType(branches.head)._1, true)
    case other => throw new UnsupportedOperationException(s"avro type $other")
  }

  // ------------------------------------------------------- schema: spark->avro

  /** Spark type -> Avro schema (nullable becomes union(null, T)). */
  def avroSchema(dt: DataType, nullable: Boolean, recordName: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
      case st: StructType =>
        val rec = Schema.createRecord(recordName, null, "graft.avro", false)
        rec.setFields(st.fields.toSeq.map(f =>
          new Schema.Field(f.name, avroSchema(f.dataType, f.nullable, s"${recordName}_${f.name}"),
            null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)).asJava)
        rec
      case ArrayType(et, containsNull) =>
        Schema.createArray(avroSchema(et, containsNull, s"${recordName}_item"))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(avroSchema(vt, valueContainsNull, s"${recordName}_value"))
      case other => throw new UnsupportedOperationException(s"spark type $other -> avro")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  // ------------------------------------------------------------- value: ->spark

  /** The avro schema rides along so unit-carrying logical types decode
    * correctly (timestamp-MILLIS vs -micros read as the same Spark
    * TimestampType but scale differently; null for callers without one —
    * micros, the writer's own unit, is then assumed). */
  private def toSpark(v: Any, dt: DataType, as: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (e: GenericData.EnumSymbol, StringType) => e.toString
    case (i: java.lang.Integer, DateType) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType) =>
      val micros: Long =
        if (logicalName(as).contains("timestamp-millis")) l * 1000L else l.longValue
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt); ts
    case (l: java.lang.Long, TimestampNTZType) => // local-timestamp-micros
      java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(l, 1000000L),
        (Math.floorMod(l, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (f: GenericData.Fixed, st: StructType)
        if f.bytes().length == 12 &&
          st.fieldNames.sameElements(Array("months", "days", "millis")) =>
      val bb = java.nio.ByteBuffer.wrap(f.bytes())
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Row(bb.getInt, bb.getInt, bb.getInt)
    case (f: GenericData.Fixed, BinaryType) => f.bytes()
    case (b: java.nio.ByteBuffer, d: DecimalType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
      BigDecimal(new java.math.BigDecimal(new java.math.BigInteger(a), d.scale))
    case (r: GenericRecord, st: StructType) => toRow(r, st)
    case (arr: java.util.Collection[_], ArrayType(et, _)) =>
      arr.asScala.toSeq.map(toSpark(_, et, elementSchema(as)))
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, mv) => k.toString -> toSpark(mv, vt, valueSchema(as)) }.toMap
    case (x, _) => x
  }

  private def nonNull(s: Schema): Schema =
    if (s != null && s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).orNull
    else s
  private def logicalName(s: Schema): Option[String] =
    Option(nonNull(s)).flatMap(x => Option(x.getLogicalType)).map(_.getName)
  private def elementSchema(s: Schema): Schema =
    Option(nonNull(s)).filter(_.getType == Schema.Type.ARRAY).map(_.getElementType).orNull
  private def valueSchema(s: Schema): Schema =
    Option(nonNull(s)).filter(_.getType == Schema.Type.MAP).map(_.getValueType).orNull

  def toRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map { f =>
      val fieldSchema = Option(rec.getSchema.getField(f.name)).map(_.schema()).orNull
      toSpark(rec.get(f.name), f.dataType, fieldSchema)
    })

  // -------------------------------------------------------------- value: ->avro

  private def toAvro(v: Any, dt: DataType, schema: Schema): Any = {
    val target = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else schema
    (v, dt) match {
      case (null, _) => null
      case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
      case (t: java.sql.Timestamp, TimestampType) =>
        t.getTime / 1000L * 1000000L + t.getNanos / 1000L % 1000000L
      case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
      case (d: java.math.BigDecimal, dec: DecimalType) =>
        java.nio.ByteBuffer.wrap(d.setScale(dec.scale).unscaledValue().toByteArray)
      case (d: BigDecimal, dec: DecimalType) =>
        java.nio.ByteBuffer.wrap(d.setScale(dec.scale).underlying().unscaledValue().toByteArray)
      case (r: Row, st: StructType) => toRecord(r, st, target)
      case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
        s.map(toAvro(_, et, target.getElementType)).toSeq.asJava
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        m.map { case (k, mv) => k.toString -> toAvro(mv, vt, target.getValueType) }.asJava
      case (x, _) => x
    }
  }

  def toRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvro(row.get(i), f.dataType, schema.getField(f.name).schema()))
    }
    rec
  }

  // --------------------------------------------------------------------- read

  /** Read a directory of .avro container files (or a single file). Schema
    * comes from the first file's header on the driver; each file is one
    * Spark partition. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isFile) Array(p.toString)
      else fs.listStatus(p).filter(_.getPath.getName.endsWith(".avro"))
        .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no .avro files under $path")
    val headerReader = new DataFileReader[GenericRecord](
      new FsInput(new Path(files.head), conf), new GenericDatumReader[GenericRecord]())
    val schemaJson = try headerReader.getSchema.toString finally headerReader.close()
    val struct = sparkType(new Schema.Parser().parse(schemaJson)) match {
      case (st: StructType, _) => st
      case (other, _) => throw new IllegalArgumentException(
        s"top-level avro schema must be a record, got $other")
    }
    // tasks re-derive the Hadoop conf locally (defaults + core-site on the
    // executor classpath) — Spark's SerializableConfiguration is
    // private[spark] and the header schema travels as JSON text
    val rdd = spark.sparkContext.parallelize(files.toSeq, files.length).flatMap { f =>
      val reader = new DataFileReader[GenericRecord](
        new FsInput(new Path(f), new Configuration()),
        new GenericDatumReader[GenericRecord]())
      val it = reader.iterator().asScala
      new Iterator[Row] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) reader.close(); h }
        def next(): Row = toRow(it.next(), struct)
      }
    }
    spark.createDataFrame(rdd, struct)
  }

  // -------------------------------------------------------------------- write

  /** Write one .avro container file per partition under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val struct = df.schema
    val avroJson = avroSchema(struct, nullable = false, "topLevelRecord").toString
    val out = new Path(path)
    out.getFileSystem(df.sparkSession.sessionState.newHadoopConf()).mkdirs(out)
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(avroJson)
        val part = new Path(path, f"part-$i%05d.avro")
        val os = part.getFileSystem(new Configuration()).create(part, true)
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, os)
        var n = 0L
        rows.foreach { r => w.append(toRecord(r, struct, schema)); n += 1 }
        w.close()
        Iterator.single(n)
      }
    }.count() // force the write; per-partition counts, no data to the driver
  }
}
