package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AggState

/** The materialized aggregate state lifecycle (AggState): fold+read equals
  * a from-scratch recompute, the three replay legs (committed no-op, torn
  * duplicate collapse, replay-after-compaction blocked by the tags
  * sidecar), meta validation, and interrupted-swap recovery. */
class AggStateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val gCols = Seq("l_returnflag", "l_linestatus")
  private val vCols = Seq("l_quantity", "l_extendedprice")

  private lazy val li = graft.engine.Tables
    .table(spark, sfDir, "lineitem")
    .select("l_orderkey", "l_returnflag", "l_linestatus",
      "l_quantity", "l_extendedprice")
  private def base = li.filter($"l_orderkey" % 4 =!= 0).drop("l_orderkey")
  private def b1 = li.filter($"l_orderkey" % 8 === 0).drop("l_orderkey")
  private def b2 = li.filter($"l_orderkey" % 8 === 4).drop("l_orderkey")

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def recompute(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(gCols.map(col): _*)
    .agg(count(lit(1)).cast("bigint").as("cnt"),
      sum($"l_quantity".cast("decimal(38,6)")).cast("decimal(38,6)")
        .cast("double").as("sum_l_quantity"),
      min($"l_quantity").as("min_l_quantity"),
      max($"l_quantity").as("max_l_quantity"),
      sum($"l_extendedprice".cast("decimal(38,6)")).cast("decimal(38,6)")
        .cast("double").as("sum_l_extendedprice"),
      min($"l_extendedprice").as("min_l_extendedprice"),
      max($"l_extendedprice").as("max_l_extendedprice"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy(gCols.map(col): _*).collect().map(_.toSeq.toVector).toSeq

  test("write + fold + read equals a from-scratch recompute, bit-exact") {
    val dir = scratch("aggstate")
    AggState.writeAggState(base, dir, gCols, vCols)
    AggState.foldAggState(b1, dir, "b1", gCols, vCols)
    AggState.foldAggState(b2, dir, "b2", gCols, vCols)
    val got = rows(AggState.readAggState(spark, dir, gCols, vCols))
    assert(got.nonEmpty)
    assert(got == rows(recompute(base.unionAll(b1).unionAll(b2))))
  }

  test("replay legs: committed no-op, torn duplicates collapse") {
    val dir = scratch("aggstate_rp")
    AggState.writeAggState(base, dir, gCols, vCols)
    AggState.foldAggState(b1, dir, "b1", gCols, vCols)
    val want = rows(AggState.readAggState(spark, dir, gCols, vCols))
    val nRows = spark.read.parquet(s"$dir/state").count()
    // leg 1: committed replay is a no-op before any write
    AggState.foldAggState(b1, dir, "b1", gCols, vCols)
    assert(spark.read.parquet(s"$dir/state").count() == nRows)
    // leg 2: torn retry (rows landed twice under one tag) — bit-identical
    // duplicates, collapsed by the read-side (group, __batch) dedupe
    // localCheckpoint: materialize before appending into the same path the
    // rows were read from
    val dup = spark.read.parquet(s"$dir/state").filter($"__batch" === "b1")
      .localCheckpoint()
    dup.write.mode("append").parquet(s"$dir/state")
    assert(spark.read.parquet(s"$dir/state").count() > nRows)
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
  }

  test("compaction: one row per group, reads unchanged, pre-compaction replay blocked") {
    val dir = scratch("aggstate_cmp")
    AggState.writeAggState(base, dir, gCols, vCols)
    AggState.foldAggState(b1, dir, "b1", gCols, vCols)
    val want = rows(AggState.readAggState(spark, dir, gCols, vCols))
    AggState.compactAggState(spark, dir, gCols, vCols)
    val st = spark.read.parquet(s"$dir/state")
    assert(st.groupBy(gCols.map(col): _*).count().filter($"count" > 1).count() == 0)
    assert(st.select("__batch").distinct().collect()
      .map(_.getString(0)).toSeq == Seq(AggState.CompactedTag))
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
    // leg 3: b1's delta rows were merged away — only the compaction-proof
    // tags sidecar can block this replay from double-counting
    AggState.foldAggState(b1, dir, "b1", gCols, vCols)
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
    // and a genuinely new fold after compaction still lands
    AggState.foldAggState(b2, dir, "b2", gCols, vCols)
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) ==
      rows(recompute(base.unionAll(b1).unionAll(b2))))
  }

  test("compaction adopts orphan tags: a merged-away torn fold cannot double-count on retry") {
    val dir = scratch("aggstate_orphan")
    AggState.writeAggState(base, dir, gCols, vCols)
    // torn fold: rows landed under tag "tb1", the tag commit never ran
    AggState.partials(b1, gCols, vCols, "tb1")
      .write.mode("append").parquet(s"$dir/state")
    val want = rows(recompute(base.unionAll(b1)))
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
    AggState.compactAggState(spark, dir, gCols, vCols)
    // the late retry of the torn fold: its rows are merged away, so only
    // the adopted tag can block the re-append
    AggState.foldAggState(b1, dir, "tb1", gCols, vCols)
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
  }

  test("fold refuses a missing state table and recovers a torn compaction swap") {
    val dir = scratch("aggstate_guard")
    // missing state (torn build / typo'd path) must not silently bootstrap
    AggState.AggStateMeta.write(spark, dir,
      AggState.AggStateMeta(gCols, vCols))
    val e = intercept[IllegalArgumentException] {
      AggState.foldAggState(b1, dir, "b1", gCols, vCols)
    }
    assert(e.getMessage.contains("no state table"))
    // torn compaction swap (live dir gone, _state_old present): a fold must
    // recover the pre-swap table BEFORE appending, not create a fresh state
    val dir2 = scratch("aggstate_guard2")
    AggState.writeAggState(base, dir2, gCols, vCols)
    assert(new java.io.File(s"$dir2/state")
      .renameTo(new java.io.File(s"$dir2/_state_old")))
    AggState.foldAggState(b1, dir2, "b1", gCols, vCols)
    assert(rows(AggState.readAggState(spark, dir2, gCols, vCols)) ==
      rows(recompute(base.unionAll(b1))))
  }

  test("retraction: exact for every measure, blocked after sealing, idempotent") {
    val dir = scratch("aggstate_retract")
    AggState.writeAggState(base, dir, gCols, vCols)
    AggState.foldAggState(b1, dir, "b1", gCols, vCols)
    AggState.foldAggState(b2, dir, "b2", gCols, vCols)
    // exact removal — min/max revert too, because the surviving per-batch
    // rows ARE the remaining candidates
    val want = rows(recompute(base.unionAll(b2)))
    AggState.retractAggState(spark, dir, "b1", gCols, vCols)
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
    // the retracted fold's replay must not resurrect the data
    AggState.foldAggState(b1, dir, "b1", gCols, vCols)
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
    // re-retract is a no-op
    AggState.retractAggState(spark, dir, "b1", gCols, vCols)
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
    // sealing: after compaction, b2 cannot be individually retracted
    AggState.compactAggState(spark, dir, gCols, vCols)
    val e = intercept[IllegalArgumentException] {
      AggState.retractAggState(spark, dir, "b2", gCols, vCols)
    }
    assert(e.getMessage.contains("sealed"))
    // but the already-retracted tag still no-ops politely post-seal...
    // (retracted check runs before the sealed check)
    AggState.retractAggState(spark, dir, "b1", gCols, vCols)
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
  }

  test("retraction intent is crash-recoverable: retry and compaction both finish a torn swap") {
    // crash window: _retracted.json written, the swap never ran
    def tornRetract(dir: String): Unit = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_retracted.json"),
        "[\"b1\"]".getBytes("UTF-8"))
      // the build wrote this sidecar through Hadoop's checksummed local FS;
      // overwriting the bytes directly leaves a stale .crc behind
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$dir/._retracted.json.crc"))
    }
    val want = rows(recompute(base))
    // leg A: the retract retry completes the swap instead of no-opping
    val d1 = scratch("aggstate_ri1")
    AggState.writeAggState(base, d1, gCols, vCols)
    AggState.foldAggState(b1, d1, "b1", gCols, vCols)
    tornRetract(d1)
    AggState.retractAggState(spark, d1, "b1", gCols, vCols)
    assert(rows(AggState.readAggState(spark, d1, gCols, vCols)) == want)
    // leg B: a compaction finishes the pending retraction instead of
    // sealing-and-merging rows the sidecar already claims are gone
    val d2 = scratch("aggstate_ri2")
    AggState.writeAggState(base, d2, gCols, vCols)
    AggState.foldAggState(b1, d2, "b1", gCols, vCols)
    tornRetract(d2)
    AggState.compactAggState(spark, d2, gCols, vCols)
    assert(rows(AggState.readAggState(spark, d2, gCols, vCols)) == want)
  }

  test("rebuild-in-place resets seal/retraction sidecars; unknown-tag retract throws") {
    val dir = scratch("aggstate_rebuild")
    AggState.writeAggState(base, dir, gCols, vCols)
    AggState.foldAggState(b1, dir, "b1", gCols, vCols)
    AggState.retractAggState(spark, dir, "b1", gCols, vCols)
    AggState.compactAggState(spark, dir, gCols, vCols) // seals everything
    // new incarnation in the same directory
    AggState.writeAggState(base, dir, gCols, vCols)
    // the previous incarnation's retraction must not turn this fold's tag
    // into a vacuous no-op...
    AggState.foldAggState(b1, dir, "b1", gCols, vCols)
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) ==
      rows(recompute(base.unionAll(b1))))
    // ...and the previous seal must not block its retraction
    AggState.retractAggState(spark, dir, "b1", gCols, vCols)
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) ==
      rows(recompute(base)))
    // a typo'd tag (never folded, no rows) fails loudly instead of being
    // silently committed (which would block the real batch's future fold)
    val e = intercept[IllegalArgumentException] {
      AggState.retractAggState(spark, dir, "b99", gCols, vCols)
    }
    assert(e.getMessage.contains("unknown batch"))
  }

  test("retracting a torn fold adopts its tag, so the late replay stays blocked") {
    val dir = scratch("aggstate_retract_torn")
    AggState.writeAggState(base, dir, gCols, vCols)
    // torn: rows landed, tag never committed
    AggState.partials(b1, gCols, vCols, "tb1")
      .write.mode("append").parquet(s"$dir/state")
    val want = rows(recompute(base))
    AggState.retractAggState(spark, dir, "tb1", gCols, vCols)
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
    AggState.foldAggState(b1, dir, "tb1", gCols, vCols) // the late retry
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
  }

  test("meta validation fails loudly; reserved tags rejected") {
    val dir = scratch("aggstate_meta")
    AggState.writeAggState(base, dir, gCols, vCols)
    val e = intercept[IllegalArgumentException] {
      AggState.readAggState(spark, dir, Seq("l_returnflag"), vCols)
    }
    assert(e.getMessage.contains("column mismatch"))
    val e2 = intercept[IllegalArgumentException] {
      AggState.foldAggState(b1, dir, "__sneaky", gCols, vCols)
    }
    assert(e2.getMessage.contains("reserved"))
    // a tag that would render _tags.json malformed is rejected up front
    val e3 = intercept[IllegalArgumentException] {
      AggState.foldAggState(b1, dir, "b\"1", gCols, vCols)
    }
    assert(e3.getMessage.contains("A-Za-z0-9"))
  }

  test("read recovers an interrupted compaction swap; streaming body is replay-exact") {
    val dir = scratch("aggstate_torn")
    AggState.writeAggState(base, dir, gCols, vCols)
    val want = rows(AggState.readAggState(spark, dir, gCols, vCols))
    val f = new java.io.File(s"$dir/state")
    assert(f.renameTo(new java.io.File(s"$dir/_state_old")))
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == want)
    // streaming per-batch body: same tag twice, merged read unchanged
    graft.streaming.StreamingAggState.aggStateBatch(b1, dir, gCols, vCols, "t_0")
    val after = rows(AggState.readAggState(spark, dir, gCols, vCols))
    graft.streaming.StreamingAggState.aggStateBatch(b1, dir, gCols, vCols, "t_0")
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols)) == after)
    assert(after == rows(recompute(base.unionAll(b1))))
  }

  test("stream restart from a durable checkpoint continues batchIds; a lost checkpoint discards new data") {
    val dir = scratch("aggstate_restart")
    AggState.writeAggState(base, s"$dir/st", gCols, vCols)
    def stage(df: org.apache.spark.sql.DataFrame, inDir: String, n: Int): Unit = {
      new java.io.File(inDir).mkdirs()
      val tmp = s"$dir/stage_${inDir.split('/').last}_$n"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$n.parquet"))
    }
    def runOnce(inDir: String, ckpt: String): Unit = {
      val stream = spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val q = graft.streaming.StreamingAggState.aggStateStream(
        stream, s"$dir/st", gCols, vCols, checkpointDir = ckpt)
      q.processAllAvailable(); q.stop()
    }
    // ingest b1, STOP, restart the loop as a brand-new query over the SAME
    // durable checkpoint, ingest b2 — the restarted query must continue
    // the batchId sequence, not reissue 0
    stage(b1, s"$dir/in1", 0)
    runOnce(s"$dir/in1", s"$dir/ckpt")
    stage(b2, s"$dir/in1", 1)
    runOnce(s"$dir/in1", s"$dir/ckpt")
    val want = rows(recompute(base.unionAll(b1).unionAll(b2)))
    assert(rows(AggState.readAggState(spark, s"$dir/st", gCols, vCols)) == want)
    // batchId continuity pinned directly: b2's fold committed under t_1
    assert(spark.read.parquet(s"$dir/st/state").select("__batch")
      .distinct().collect().map(_.getString(0)).toSet
      == Set("__base", "t_0", "t_1"))
    // the failure mode the durable-checkpoint requirement exists for,
    // OBSERVED rather than argued: a restart whose checkpoint was lost
    // (Spark's temporary checkpoints are per-query throwaways) reissues
    // batchId 0 for brand-new data — tag t_0 is already committed, so the
    // batch is silently discarded
    val b3 = b1.withColumn("l_quantity", $"l_quantity" + 1)
    stage(b3, s"$dir/in2", 0)
    runOnce(s"$dir/in2", s"$dir/ckpt_lost")
    assert(rows(AggState.readAggState(spark, s"$dir/st", gCols, vCols)) == want,
      "the lost-checkpoint restart must exhibit the documented silent discard")
    // which is why the loop refuses to start without an explicit checkpoint
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingAggState.aggStateStream(
        spark.readStream.schema(base.schema).parquet(s"$dir/in2"),
        s"$dir/st", gCols, vCols, checkpointDir = "")
    }
    assert(e.getMessage.contains("durable checkpoint"))
  }

  test("torn rebuild marker: a crashed writeAggState refuses every entry point until re-run") {
    val dir = scratch("aggstate_reb_torn")
    AggState.writeAggState(base, dir, gCols, vCols)
    AggState.foldAggState(b1, dir, "b1", gCols, vCols)
    // the crash window: a rebuild-in-place died after resetting the
    // sidecars but before the state overwrite — the OLD incarnation's
    // state sits under fresh sidecars, and only the surviving intent
    // marker distinguishes that from a healthy directory
    new java.io.File(s"$dir/_rebuild_intent").createNewFile()
    Seq(
      () => AggState.readAggState(spark, dir, gCols, vCols).collect(),
      () => AggState.foldAggState(b2, dir, "b2", gCols, vCols),
      () => AggState.compactAggState(spark, dir, gCols, vCols),
      () => AggState.retractAggState(spark, dir, "b1", gCols, vCols)
    ).foreach { f =>
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("torn writeAggState"))
    }
    // the documented remedy — re-run the rebuild — clears the marker and
    // starts the new incarnation cleanly
    AggState.writeAggState(base, dir, gCols, vCols)
    assert(!new java.io.File(s"$dir/_rebuild_intent").exists())
    assert(rows(AggState.readAggState(spark, dir, gCols, vCols))
      == rows(recompute(base)))
  }
}
