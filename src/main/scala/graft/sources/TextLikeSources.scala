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
