package graft.sources

import java.io.{DataInputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.time.LocalDate

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Tajo RawFile storage — the reference's binary row format
  * (tajo-storage-hdfs/src/main/java/org/apache/tajo/storage/rawfile/
  * DirectRawFileWriter.java, DirectRawFileScanner.java; row layout in
  * tajo-common/src/main/java/org/apache/tajo/tuple/memory/OffHeapRowWriter.java:29-34):
  *
  *   | row length (int32) | field 1 offset | ... | field N offset | field data |
  *
  * all little-endian; a field offset is the field's byte offset from the
  * row start, or -1 (MemoryRowBlock.NULL_FIELD_OFFSET) for NULL; row
  * length includes the header. Field encodings follow OffHeapRowWriter:
  * bool = 1 byte (0x01/0x00), int2/int4/int8/float4/float8 fixed-width LE,
  * text/blob = int32 byte length + bytes, date = Julian day (int32,
  * unix epoch = 2,440,588 — DateTimeConstants.UNIX_EPOCH_JDATE),
  * timestamp = Julian microseconds (int64, offset 946,684,800 s —
  * DateTimeConstants.SECS_DIFFERENCE_BETWEEN_JULIAN_AND_UNIXTIME).
  *
  * Scale notes: the format is the reference's LOCAL / intermediate-shuffle
  * representation — rows are length-chained with no sync markers, so a
  * file is not block-splittable; parallelism is file-per-task on read and
  * partition-per-file on write (exactly the reference's fragment model).
  * Use parquet/orc for long-lived distributed tables; this source exists
  * for format parity and for exchanging files with reference deployments.
  */
object RawFileSource {

  private val UnixEpochJDate = 2440588
  private val JulianUnixDiffMicros = 946684800L * 1000000L
  private val NullOffset = -1

  // ------------------------------------------------------------- write

  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val confBytes = new SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val fs = FileSystem.get(new java.net.URI(path), confBytes.value)
      val file = new Path(path, f"part-$idx%05d.raw")
      val out = fs.create(file, true)
      try rows.foreach(r => out.write(encodeRow(r, schema)))
      finally out.close()
      Iterator.single(idx)
    }.count(): Unit
  }

  private[graft] def encodeRow(r: Row, schema: StructType): Array[Byte] = {
    val n = schema.length
    val headerSize = 4 + 4 * n
    val lens = new Array[Int](n)
    var dataSize = 0
    var i = 0
    while (i < n) {
      lens(i) = if (r.isNullAt(i)) 0 else fieldSize(r, i, schema(i).dataType)
      dataSize += lens(i)
      i += 1
    }
    val buf = ByteBuffer.allocate(headerSize + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(headerSize + dataSize)
    var off = headerSize
    i = 0
    while (i < n) {
      if (r.isNullAt(i)) buf.putInt(NullOffset)
      else { buf.putInt(off); off += lens(i) }
      i += 1
    }
    i = 0
    while (i < n) {
      if (!r.isNullAt(i)) putField(buf, r, i, schema(i).dataType)
      i += 1
    }
    buf.array()
  }

  private def fieldSize(r: Row, i: Int, dt: DataType): Int = dt match {
    case BooleanType => 1
    case ShortType => 2
    case IntegerType | FloatType | DateType => 4
    case LongType | DoubleType | TimestampType | TimestampNTZType => 8
    case StringType => 4 + r.getString(i).getBytes(StandardCharsets.UTF_8).length
    case BinaryType => 4 + r.getAs[Array[Byte]](i).length
    case other => unsupported(other)
  }

  private def putField(buf: ByteBuffer, r: Row, i: Int, dt: DataType): Unit = dt match {
    case BooleanType => buf.put(if (r.getBoolean(i)) 1.toByte else 0.toByte)
    case ShortType => buf.putShort(r.getShort(i))
    case IntegerType => buf.putInt(r.getInt(i))
    case LongType => buf.putLong(r.getLong(i))
    case FloatType => buf.putFloat(r.getFloat(i))
    case DoubleType => buf.putDouble(r.getDouble(i))
    case DateType =>
      buf.putInt(r.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt + UnixEpochJDate)
    case TimestampType =>
      val inst = r.getAs[java.sql.Timestamp](i).toInstant
      val micros = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      buf.putLong(micros - JulianUnixDiffMicros)
    case TimestampNTZType => // Tajo TIMESTAMP is itself zone-less
      val ldt = r.getAs[java.time.LocalDateTime](i)
      val micros = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      buf.putLong(micros - JulianUnixDiffMicros)
    case StringType => val b = r.getString(i).getBytes(StandardCharsets.UTF_8)
      buf.putInt(b.length); buf.put(b)
    case BinaryType => val b = r.getAs[Array[Byte]](i)
      buf.putInt(b.length); buf.put(b)
    case other => unsupported(other)
  }

  private def unsupported(dt: DataType): Nothing =
    throw new IllegalArgumentException(
      s"rawfile: unsupported type $dt (reference types: bool/int2/int4/int8/float4/float8/text/blob/date/timestamp)")

  // -------------------------------------------------------------- read

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(new Path(path, "*.raw").toString)
      .flatMap { case (_, pds) => recordIterator(pds.open(), schema) }
    spark.createDataFrame(rows, schema)
  }

  private def recordIterator(in: DataInputStream, schema: StructType): Iterator[Row] =
    new Iterator[Row] {
      private var nextRow: Row = advance()
      private def advance(): Row = {
        val lenBytes = new Array[Byte](4)
        try in.readFully(lenBytes)
        catch { case _: EOFException => in.close(); return null }
        val rowLen = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getInt
        val rest = new Array[Byte](rowLen - 4)
        in.readFully(rest)
        val buf = ByteBuffer.allocate(rowLen).order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt(rowLen); buf.put(rest); buf.flip()
        decodeRow(buf, schema)
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): Row = { val r = nextRow; nextRow = advance(); r }
    }

  private[graft] def decodeRow(buf: ByteBuffer, schema: StructType): Row = {
    val n = schema.length
    val offsets = new Array[Int](n)
    buf.position(4)
    var i = 0
    while (i < n) { offsets(i) = buf.getInt; i += 1 }
    val vals = new Array[Any](n)
    i = 0
    while (i < n) {
      vals(i) =
        if (offsets(i) == NullOffset) null
        else { buf.position(offsets(i)); getField(buf, schema(i).dataType) }
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  private def getField(buf: ByteBuffer, dt: DataType): Any = dt match {
    case BooleanType => buf.get() == 1.toByte
    case ShortType => buf.getShort()
    case IntegerType => buf.getInt()
    case LongType => buf.getLong()
    case FloatType => buf.getFloat()
    case DoubleType => buf.getDouble()
    case DateType => java.sql.Date.valueOf(LocalDate.ofEpochDay((buf.getInt() - UnixEpochJDate).toLong))
    case TimestampType =>
      val micros = buf.getLong() + JulianUnixDiffMicros
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case TimestampNTZType =>
      val micros = buf.getLong() + JulianUnixDiffMicros
      java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    case StringType =>
      val b = new Array[Byte](buf.getInt()); buf.get(b); new String(b, StandardCharsets.UTF_8)
    case BinaryType =>
      val b = new Array[Byte](buf.getInt()); buf.get(b); b
    case other => unsupported(other)
  }

  /** Hadoop Configuration is not serializable; ship it by value. */
  private final class SerializableHadoopConf(@transient private var conf: Configuration)
      extends Serializable {
    def value: Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }
}
