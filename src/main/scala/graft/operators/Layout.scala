package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout management: Z-order clustering and small-file
  * compaction — the OPTIMIZE half of a lakehouse table service. Reference
  * scope: Tajo's only layout tool is the sorted index rebuild
  * (`tajo-core/src/main/java/org/apache/tajo/master/exec/DDLExecutor
  * .java:47`, surfaced here as CREATE INDEX); multi-dimensional
  * clustering and compaction are the pipeline extensions a 100 TB
  * parquet estate actually runs nightly.
  *
  * Z-ordering interleaves the bits of two key columns into one morton
  * code and range-lays the files by that code, so parquet row-group
  * min/max stats prune scans filtered on EITHER dimension — the
  * single-key sorted index only prunes its own key. The code is pure
  * DIV/%/multiply integer arithmetic (no engine bit-op dialect), so the
  * same spelling evaluates in Spark and DuckDB and the driver oracle
  * replays it exactly. */
object Layout {

  /** Morton interleave of the low `bits` bits of two NON-NEGATIVE integer
    * expressions, as portable SQL (`DIV`; pass spark=false for `//`).
    * Code fits in 2·bits ≤ 62 bits. */
  def mortonSql(a: String, b: String, bits: Int = 16, spark: Boolean = true): String = {
    require(bits >= 1 && bits <= 31)
    val div = if (spark) "DIV" else "//"
    (0 until bits).map { i =>
      val p = 1L << i; val qa = 1L << (2 * i); val qb = 1L << (2 * i + 1)
      s"((($a) $div $p) % 2) * $qa + ((($b) $div $p) % 2) * $qb"
    }.mkString("(", " + ", ")")
  }

  /** N-ary morton interleave: bit `i` of dimension `d` lands at code
    * position `i * k + d`, the straight generalization of the 2-dim code
    * (to which it degenerates at k=2, LayoutSpec pins the equivalence).
    * Same pure DIV/%/multiply arithmetic, so Spark and DuckDB evaluate the
    * identical spelling. Code fits in k·bits ≤ 62 bits. */
  def mortonSqlN(cols: Seq[String], bits: Int = 8, spark: Boolean = true): String = {
    val k = cols.length
    require(k >= 2 && bits >= 1 && k * bits <= 62,
      s"need 2+ dims and k*bits <= 62, got k=$k bits=$bits")
    val div = if (spark) "DIV" else "//"
    (for { i <- 0 until bits; (c, d) <- cols.zipWithIndex } yield {
      val p = 1L << i; val q = 1L << (i * k + d)
      s"((($c) $div $p) % 2) * $q"
    }).mkString("(", " + ", ")")
  }

  /** N-ary min/max stats (one narrow aggregation, 2k scalars to the
    * driver), with the all-NULL/empty guard. */
  def zStatsN(df: DataFrame, cols: Seq[String]): Seq[(Long, Long)] = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val r = df.agg(aggs.head, aggs.tail: _*).head
    cols.indices.map { i =>
      require(!r.isNullAt(2 * i),
        s"zStatsN(${cols(i)}): input is empty or the key column is all-NULL")
      (r.getLong(2 * i), r.getLong(2 * i + 1))
    }
  }

  /** N-ary morton code over min/max-normalized keys. */
  def scaledMortonSqlN(cols: Seq[String], stats: Seq[(Long, Long)],
                       bits: Int = 8, spark: Boolean = true): String =
    mortonSqlN(cols.zip(stats).map { case (c, (mn, mx)) =>
      scaleSql(c, mn, mx, bits, spark) }, bits, spark)

  /** Z-order a table on `cols` (2 or more dimensions) into `files`
    * range-clustered parquet files — same cost shape as [[zorderWrite]]:
    * one stats aggregation + one range exchange on the code. More
    * dimensions split the per-dimension resolution (k·bits ≤ 62), the
    * standard OPTIMIZE ZORDER trade: each added key dilutes, but every key
    * prunes. */
  def zorderWriteN(df: DataFrame, cols: Seq[String], path: String,
                   files: Int = 8, bits: Int = 8): DataFrame = {
    val stats = zStatsN(df, cols)
    df.withColumn("__z", expr(scaledMortonSqlN(cols, stats, bits)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Min/max stats for the two clustering keys — four scalars to the
    * driver (bounded; the same driver-scalar class as pageRank's node
    * count). */
  def zStats(df: DataFrame, colA: String, colB: String): (Long, Long, Long, Long) = {
    val r = df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"zStats($colA, $colB): input is empty or the key columns are all-NULL — " +
        "z-order needs at least one non-NULL value per clustering key")
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Scale a value into the [0, 2^bits) rank domain from its column's
    * min/max — interleaving RAW values of asymmetric-width keys wastes the
    * narrow key's bits (a 7-bit suppkey interleaved with an 11-bit partkey
    * leaves the top z bits pure partkey, so suppkey predicates prune
    * nothing); equal-width normalization is what makes z-order prune BOTH
    * dimensions, and is what production OPTIMIZE ZORDER implementations
    * do. Portable integer arithmetic (`DIV` / `//`). */
  def scaleSql(v: String, mn: Long, mx: Long, bits: Int, spark: Boolean = true): String = {
    val div = if (spark) "DIV" else "//"
    s"(((($v) - $mn) * ${(1L << bits) - 1}) $div ${math.max(1L, mx - mn)})"
  }

  /** Morton code over the min/max-normalized keys. */
  def scaledMortonSql(a: String, b: String, stats: (Long, Long, Long, Long),
                      bits: Int = 8, spark: Boolean = true): String =
    mortonSql(scaleSql(a, stats._1, stats._2, bits, spark),
      scaleSql(b, stats._3, stats._4, bits, spark), bits, spark)

  /** Z-order a table on (colA, colB) into `files` range-clustered parquet
    * files at `path`, and return the read-back DataFrame. Scale: two
    * narrow stat aggregations + one range exchange on the morton code
    * (the same cost class as the sorted index rebuild); everything else
    * is a per-row projection. */
  def zorderWrite(df: DataFrame, colA: String, colB: String, path: String,
                  files: Int = 8, bits: Int = 8): DataFrame = {
    val stats = zStats(df, colA, colB)
    val coded = df.withColumn("__z", expr(scaledMortonSql(colA, colB, stats, bits)))
    coded.repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Compact a directory of (typically many small) parquet files into
    * ceil(bytes / targetBytes) files. Content-preserving by construction
    * (pure rewrite); the registered query's oracle checks the content,
    * CompactionSpec checks the file arithmetic. Scale: ONE coalesce-free
    * repartition round-robin exchange — at 100 TB this is the nightly
    * table-service job, and `targetBytes` is the knob that matches files
    * to the reader's `maxPartitionBytes`. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val files = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(files)
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }
}
