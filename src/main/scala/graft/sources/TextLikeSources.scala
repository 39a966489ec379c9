package graft.sources

import org.apache.hadoop.io.{NullWritable, Text}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Hadoop SequenceFile rows-as-delimited-text storage — the reference's
  * sequencefile tablespace with its text serde (reference: tajo-storage/
  * tajo-storage-hdfs/src/main/java/org/apache/tajo/storage/sequencefile/
  * SequenceFileScanner.java, SequenceFileAppender.java; delimiter and null
  * token come from the same `text.*` table properties as the text
  * tablespace).
  *
  * Read: sc.sequenceFile splits by the container's sync markers (same
  * block-level parallelism as any Hadoop input), values parse through
  * Spark's csv reader — schema, delimiter, null token all honored, fully
  * codegen'd downstream. Write: one SequenceFile per partition via
  * saveAsSequenceFile, rows rendered with concat_ws.
  */
object SequenceFileSource {

  def read(spark: SparkSession, path: String, schema: StructType,
           delimiter: String = "|", nullToken: String = ""): DataFrame = {
    val lines: Dataset[String] = {
      import spark.implicits._
      spark.sparkContext.sequenceFile(path, classOf[NullWritable], classOf[Text])
        .map(_._2.toString).toDS()
    }
    spark.read.schema(schema)
      .option("sep", delimiter).option("nullValue", nullToken)
      .csv(lines)
  }

  def write(df: DataFrame, path: String,
            delimiter: String = "|", nullToken: String = ""): Unit = {
    val rendered = df.select(
      concat_ws(delimiter,
        df.columns.map(c => coalesce(col(c).cast("string"), lit(nullToken))): _*))
    rendered.rdd.map(r => (NullWritable.get(), new Text(r.getString(0))))
      .saveAsSequenceFile(path)
  }
}

/** Regex-projected text storage — the reference's regex tablespace
  * (reference: tajo-storage/tajo-storage-hdfs/src/main/java/org/apache/
  * tajo/storage/regex/RegexLineDeserializer.java): each line matches a
  * pattern; capture group i feeds column i of the declared schema.
  * Non-matching lines become all-NULL rows, matching the reference's
  * permissive deserializer. Pure per-row projection over spark.read.text —
  * scan-speed at any scale, no shuffle. */
object RegexTextSource {

  def read(spark: SparkSession, path: String, pattern: String,
           schema: StructType): DataFrame = {
    val raw = spark.read.text(path)
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      // empty capture -> NULL, then cast to the declared type
      nullif(regexp_extract(col("value"), pattern, i + 1), lit(""))
        .cast(f.dataType).as(f.name)
    }
    raw.select(cols.toSeq: _*)
  }
}

/** Hive RCFile (record-columnar) storage — the reference bundles its own
  * copy of this format (reference: tajo-storage/tajo-storage-hdfs/src/main/
  * java/org/apache/tajo/storage/rcfile/RCFile.java, RCFileScanner with its
  * text serde and `rcfile.null` property). The hive-exec/hive-serde jars in
  * this Spark distribution carry the same reader/writer, so the format is
  * fully supported without new dependencies.
  *
  * Serde: the reference's TextSerializerDeserializer — every column value
  * is UTF-8 text bytes, the configured null token means NULL. Read is one
  * task per .rc file (row groups stream through the columnar reader);
  * values parse to the declared schema through string casts. Write emits
  * one RCFile per partition.
  */
object RCFileSource {
  import org.apache.hadoop.hive.ql.io.RCFile
  import org.apache.hadoop.hive.serde2.columnar.{BytesRefArrayWritable, BytesRefWritable}
  import org.apache.hadoop.io.LongWritable
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types.{StringType, StructField, StructType}

  def read(spark: SparkSession, path: String, schema: StructType,
           nullToken: String = ""): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isFile) Array(p.toString)
      else fs.listStatus(p).filter { f =>
        val n = f.getPath.getName; f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no files under $path")
    val nCols = schema.length
    val rdd = spark.sparkContext.parallelize(files.toSeq, files.length).flatMap { f =>
      val c = new org.apache.hadoop.conf.Configuration()
      val fp = new org.apache.hadoop.fs.Path(f)
      val reader = new RCFile.Reader(fp.getFileSystem(c), fp, c)
      val rowId = new LongWritable()
      val row = new BytesRefArrayWritable()
      new Iterator[Row] {
        private var advanced = false
        private var more = true
        private def advance(): Unit = if (!advanced) {
          more = reader.next(rowId)
          if (!more) reader.close()
          advanced = true
        }
        def hasNext: Boolean = { advance(); more }
        def next(): Row = {
          advance(); advanced = false
          reader.getCurrentRow(row)
          Row.fromSeq((0 until nCols).map { i =>
            val ref = row.get(i)
            val s = new String(ref.getData, ref.getStart, ref.getLength, "UTF-8")
            if (s == nullToken) null else s
          })
        }
      }
    }
    val asStrings = spark.createDataFrame(rdd,
      StructType(schema.fields.map(f => StructField(f.name, StringType, nullable = true))))
    asStrings.select(schema.fields.toSeq.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  def write(df: DataFrame, path: String, nullToken: String = ""): Unit = {
    val nCols = df.schema.length
    val out = new org.apache.hadoop.fs.Path(path)
    out.getFileSystem(df.sparkSession.sessionState.newHadoopConf()).mkdirs(out)
    val rendered = df.select(df.columns.toSeq.map(c =>
      org.apache.spark.sql.functions.col(c).cast("string")): _*)
    rendered.rdd.mapPartitionsWithIndex { (i, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val c = new org.apache.hadoop.conf.Configuration()
        // RCFileOutputFormat.setColumnNumber's underlying key — the writer
        // reads the column count from the conf
        c.setInt("hive.io.rcfile.column.number.conf", nCols)
        val part = new org.apache.hadoop.fs.Path(path, f"part-$i%05d.rc")
        val writer = new RCFile.Writer(part.getFileSystem(c), c, part)
        var n = 0L
        rows.foreach { r =>
          val braw = new BytesRefArrayWritable(nCols)
          var j = 0
          while (j < nCols) {
            val bytes = (if (r.isNullAt(j)) nullToken else r.getString(j)).getBytes("UTF-8")
            braw.set(j, new BytesRefWritable(bytes, 0, bytes.length))
            j += 1
          }
          writer.append(braw)
          n += 1
        }
        writer.close()
        Iterator.single(n)
      }
    }.count()
  }
}
