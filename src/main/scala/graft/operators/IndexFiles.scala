package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE copy of the crash-sensitive filesystem protocol shared by every
  * persisted-index implementation (the MinHash near-dup index and the
  * residual IVF-PQ index): staged-and-swap table rewrites, read-side
  * recovery from an interrupted swap, small sidecar file IO. Six
  * hand-rolled copies of rename choreography is how object-store fixes
  * drift apart — this object exists so a future change (e.g. a
  * manifest-based swap for S3) lands once.
  *
  * Swap protocol: stage written fully first, then rename(live, _old),
  * rename(stage, live), delete(_old). The crash window between the two
  * renames leaves no live directory; [[recoverInterruptedSwap]] (called
  * by every index read) renames `_old` back — the pre-swap table:
  * correct, just uncompacted. Rename is assumed atomic and O(1)
  * (HDFS/POSIX), NOT true on bare object stores — front those with a
  * manifest/pointer layer or a table format that owns the swap. After
  * any swap the path's file-status cache is evicted: a DataFrame handle
  * created before the swap must be re-read regardless (its captured
  * file list points at vanished parts). */
private[operators] object IndexFiles {

  def fs(spark: SparkSession, p: Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Rewrite `dir/name` in place via the staged two-rename swap. The
    * stage write executes against the CURRENT live files; the renames
    * only happen after it is fully materialized. Not concurrency-safe
    * against a simultaneous writer (the standard LSM-style contract). */
  def stagedSwap(spark: SparkSession, dir: String, name: String)
                (rewrite: DataFrame => DataFrame): Unit = {
    // self-recover first: if a PRIOR swap of this table crashed between
    // its renames, the live directory is missing and the documented
    // remedy — "re-run the operation" — would otherwise throw
    // PATH_NOT_FOUND on the read below instead of recovering (reads via
    // the index entry points recover, but a direct retry of the swap
    // itself must too: the streaming fold's at-least-once replay hits
    // exactly this path)
    recoverInterruptedSwap(spark, dir, name, s"stagedSwap($name)")
    val live = new Path(s"$dir/$name")
    val stage = new Path(s"$dir/_${name}_compact")
    val old = new Path(s"$dir/_${name}_old")
    rewrite(spark.read.parquet(live.toString))
      .write.mode("overwrite").parquet(stage.toString)
    val f = fs(spark, live)
    f.delete(old, true)
    require(f.rename(live, old) && f.rename(stage, live),
      s"compaction swap failed for $live — index left under $old")
    f.delete(old, true)
    spark.catalog.refreshByPath(live.toString)
  }

  /** If `dir/name` is missing but `_name_old` exists (a swap crashed
    * between its two renames), rename the pre-swap table back into place.
    * Called at the top of every index read. */
  def recoverInterruptedSwap(spark: SparkSession, dir: String, name: String,
                             what: String): Unit = {
    val live = new Path(s"$dir/$name")
    val old = new Path(s"$dir/_${name}_old")
    val f = fs(spark, live)
    if (!f.exists(live) && f.exists(old)) {
      require(f.rename(old, live), s"$what recovery rename $old -> $live failed")
      spark.catalog.refreshByPath(live.toString)
      System.err.println(s"[graft] $what: recovered $live from an interrupted " +
        "compaction swap (pre-compaction table restored)")
    }
  }

  /** Overwrite a small sidecar FILE (sketch bytes, meta json) with the
    * same two-rename discipline as the table swap — the naive
    * delete-then-create spelling has a crash window that loses the file
    * outright. [[readFileWithRecovery]] restores `_name_old` on read. */
  def writeFileSwap(spark: SparkSession, dir: String, name: String,
                    bytes: Array[Byte]): Unit = {
    val live = new Path(s"$dir/$name")
    val tmp = new Path(s"$dir/_${name}_tmp")
    val old = new Path(s"$dir/_${name}_old")
    val f = fs(spark, live)
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    f.delete(old, false)
    if (f.exists(live)) require(f.rename(live, old),
      s"sidecar swap rename $live -> $old failed")
    require(f.rename(tmp, live), s"sidecar swap rename $tmp -> $live failed")
    f.delete(old, false)
  }

  /** Read a small sidecar file fully, recovering `_name_old` if a
    * [[writeFileSwap]] crashed between its renames. None if absent. */
  def readFileWithRecovery(spark: SparkSession, dir: String,
                           name: String): Option[Array[Byte]] = {
    val live = new Path(s"$dir/$name")
    val old = new Path(s"$dir/_${name}_old")
    val f = fs(spark, live)
    if (!f.exists(live) && f.exists(old)) {
      require(f.rename(old, live), s"sidecar recovery rename $old -> $live failed")
      System.err.println(s"[graft] recovered sidecar $live from an interrupted write")
    }
    if (!f.exists(live)) None
    else {
      val in = f.open(live)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](1 << 16)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(buf.toByteArray)
      } finally in.close()
    }
  }
}
