package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shards — the de-facto shipping format for
  * large-scale (multimodal) training corpora: a corpus becomes N tar
  * archives, each holding one member file per sample, consumed
  * sequentially by data loaders. Pure-JVM ustar (POSIX.1-1988) layout:
  * 512-byte headers with octal size/checksum fields, content padded to
  * 512, two zero blocks at the end — readable by any tar implementation.
  *
  * Determinism: shard assignment is `pmod(id, shards)` and members are
  * written in ascending id order with fixed mtime/uid/gid, so two runs (or
  * two clusters) produce byte-identical archives.
  *
  * Scale: one hash shuffle on the shard id; each shard streams out of a
  * single task (the standard tar constraint — shards are the parallelism
  * unit, so size `shards` to the cluster, thousands at 100 TB). Writers go
  * through the Hadoop FileSystem of the session, so the same code targets
  * local disk or HDFS/object stores. Reading distributes over Spark's
  * binaryFile source — one task per shard — and parses headers with the
  * checksum verified.
  */
object TarShards {

  private final val Block = 512

  private def headerFor(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](Block)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }
    def oct(off: Int, width: Int, v: Long): Unit =
      put(off, ("%0" + (width - 1) + "o").format(v)) // NUL-terminated by the zero fill
    require(name.getBytes(StandardCharsets.US_ASCII).length <= 100, s"name too long: $name")
    // 12-byte octal size field holds 11 digits: 8 GiB - 1 max per member
    require(size >= 0 && size <= (1L << 33) - 1, s"member too large for ustar: $size")
    put(0, name)
    oct(100, 8, 420L)      // mode 0644
    oct(108, 8, 0L)        // uid
    oct(116, 8, 0L)        // gid
    oct(124, 12, size)
    oct(136, 12, 0L)       // mtime: fixed epoch for byte-identical output
    put(148, "        ")   // chksum field counts as spaces
    h(156) = '0'           // typeflag: regular file
    put(257, "ustar")      // POSIX magic: "ustar" NUL + version "00"
    put(263, "00")
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    oct(148, 7, sum)       // 6 octal digits + NUL, then the space at 155 stays
    h(155) = ' '
    h
  }

  private def checksumOk(h: Array[Byte]): Boolean = {
    var sum = 0L
    var i = 0
    while (i < Block) { sum += (if (i >= 148 && i < 156) 32 else h(i) & 0xff); i += 1 }
    val field = new String(h, 148, 8, StandardCharsets.US_ASCII)
      .replace('\u0000', ' ').trim
    field.nonEmpty && java.lang.Long.parseLong(field, 8) == sum
  }

  /** Write `docs` into `shards` tar archives under `outDir`
    * (shard-00000.tar, ...), one member `<id>.txt` per row in ascending id
    * order. Returns nothing; read back with [[read]]. */
  def write(docs: DataFrame, idCol: String, textCol: String,
            outDir: String, shards: Int, compress: Boolean = false): Unit = {
    require(shards >= 1, s"need shards >= 1, got $shards")
    val spark = docs.sparkSession
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val out = outDir
    docs
      .select(col(idCol).cast("bigint").as("__id"), col(textCol).cast("string").as("__t"))
      .withColumn("__shard", pmod(col("__id"), lit(shards.toLong)).cast("int"))
      .repartition(shards, col("__shard"))
      .sortWithinPartitions("__shard", "__id")
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        val fs = new Path(out).getFileSystem(hconf.value)
        var current = -1
        var os: java.io.OutputStream = null
        def close(): Unit = if (os != null) {
          os.write(new Array[Byte](2 * Block)) // end-of-archive marker
          os.close(); os = null
        }
        try {
          it.foreach { r =>
            val shard = r.getInt(2)
            if (shard != current) {
              close()
              current = shard
              val suffix = if (compress) ".tar.gz" else ".tar"
              val raw = fs.create(new Path(out, f"shard-$shard%05d$suffix"), true)
              // the JDK gzip header carries MTIME = 0, so compressed shards
              // stay byte-identical across runs like the plain ones
              os = if (compress) new java.util.zip.GZIPOutputStream(raw) else raw
            }
            val bytes = r.getString(1).getBytes(StandardCharsets.UTF_8)
            os.write(headerFor(s"${r.getLong(0)}.txt", bytes.length.toLong))
            os.write(bytes)
            val pad = (Block - bytes.length % Block) % Block
            if (pad > 0) os.write(new Array[Byte](pad))
          }
          close()
        } finally {
          // failure path: release the fd without the end marker — the task
          // retry recreates the file from scratch (fs.create overwrites)
          if (os != null) os.close()
        }
      }
  }

  /** Read tar shards written by [[write]] (or any ustar archive of
    * `<id>.txt` members) back to (doc_id, text, shard) — one task per
    * shard via the binaryFile source; header checksums are verified. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.tar*")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) =>
        val bytes =
          if (path.endsWith(".gz"))
            new java.util.zip.GZIPInputStream(
              new java.io.ByteArrayInputStream(raw)).readAllBytes()
          else raw
        val shard = "shard-(\\d+)\\.tar".r.findFirstMatchIn(path)
          .map(_.group(1).toInt).getOrElse(-1)
        val outRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
        var off = 0
        var done = false
        while (!done && off + Block <= bytes.length) {
          val h = java.util.Arrays.copyOfRange(bytes, off, off + Block)
          if (h.forall(_ == 0)) done = true
          else {
            require(checksumOk(h), s"bad tar checksum at offset $off in $path")
            val name = new String(h.takeWhile(_ != 0), StandardCharsets.US_ASCII)
            val size = java.lang.Long.parseLong(
              new String(h, 124, 12, StandardCharsets.US_ASCII)
                .replace('\u0000', ' ').trim, 8)
            val start = off + Block
            val text = new String(bytes, start, size.toInt, StandardCharsets.UTF_8)
            val id = name.stripSuffix(".txt").toLong
            outRows += ((id, text, shard))
            off = start + ((size.toInt + Block - 1) / Block) * Block
          }
        }
        outRows
      }
      .toDF("doc_id", "text", "shard")
  }
}
