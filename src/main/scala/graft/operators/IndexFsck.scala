package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Consistency checker — "fsck" — for the persisted-state families: the
  * operational capstone of the crash/replay machinery. The markers, write
  * leases, meta tags, and sidecars make corruption DETECTABLE at the
  * moment a writer misbehaves; this makes the same invariants CHECKABLE
  * after the fact, so a deployment can audit an index it inherited, or
  * one whose write history it doubts, instead of retroactively trusting
  * the write path's discipline. The reference gets the equivalent
  * guarantee by serializing every DDL mutation through one master
  * (`/root/reference/tajo-core/src/main/java/org/apache/tajo/master/exec/DDLExecutor.java`);
  * here state is files on a shared filesystem, so the auditor is a query.
  *
  * Every check is ONE bounded aggregation or anti-join over INDEX-sized
  * tables — corpus text is never read — and contributes one
  * (family, check, violations) row; the whole report is a few dozen rows
  * regardless of corpus size, so running it before serving a freshly
  * compacted 100 TB index costs an index scan, not a corpus scan.
  *
  * What `violations` means per check (0 = invariant holds):
  *   - bm25/ghost_postings — postings rows whose document has no doclens
  *     row (a torn never-retried append; invisible to scoring by the
  *     liveness rule, but dead weight and a revival hazard for reused
  *     ids — see `appendBm25Index`'s compact-marker guard).
  *   - bm25/duplicate_postings — surplus (term, id) rows beyond one (a
  *     crash-retried append; over-counts tf/df until compaction).
  *   - bm25/duplicate_doclens — surplus doclens rows per id (same cause;
  *     over-counts dl and n_docs).
  *   - agg_state/orphan_tag_rows — delta rows whose tag was never
  *     committed to `_tags.json` (a torn fold awaiting retry or
  *     compaction adoption).
  *   - agg_state/duplicate_partials — surplus (group, tag) rows (a torn
  *     retry; bit-identical by DECIMAL determinism, collapsed at read,
  *     reclaimed by compaction).
  *   - agg_state/retracted_rows_present — rows whose tag is recorded
  *     retracted in `_retracted.json` (a retraction that crashed between
  *     intent and swap; finished by its retry or the next compaction).
  *   - cluster/keeper_above_doc — rows whose keeper exceeds their doc id
  *     (keepers are cluster MINIMA, so keeper <= doc_id always).
  *   - cluster/dangling_keepers — rows referencing a keeper with no own
  *     row (a torn partitioned-fold commit; `repairClusterStatePartitioned`
  *     restores these).
  *   - cluster/keeper_not_fixpoint — rows whose keeper's own row points
  *     at a third label (a torn relabel; same repair).
  *   - ivf_pq/wrong_subspace_count — vector ids with a code-row count
  *     other than the stored geometry's m (a partial code write).
  *   - ivf_pq/cell_out_of_range — code rows referencing a cell absent
  *     from the centroid table (mixed-build state).
  *   - ivf_pq/duplicate_codes — surplus (id, subspace) rows (a retried
  *     append; doubles summed ADC distances until compaction).
  *
  * One real corruption often trips SEVERAL checks (a half-written code
  * batch is both wrong_subspace_count and possibly cell_out_of_range) —
  * that is signal, not double-counting: each row states which invariant
  * is broken. Repairs are the families' own maintenance calls (compact /
  * repair / re-run the interrupted operation), named above per check. */
object IndexFsck {

  private def checkRow(family: String, check: String,
                       violations: DataFrame): DataFrame =
    violations.agg(count(lit(1)).cast("bigint").as("violations"))
      .select(lit(family).as("family"), lit(check).as("check"),
        col("violations"))

  /** The three BM25-index invariants, from the stored tables only. */
  def checkBm25(spark: SparkSession, dir: String,
                idCol: String = "doc_id"): DataFrame = {
    val idx = Retrieval.Bm25Index.read(spark, dir)
    val ghost = idx.postings.join(
      idx.doclens.select(col(idCol)), Seq(idCol), "left_anti")
    val dupPost = idx.postings.groupBy("term", idCol)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(explode(expr("SEQUENCE(2, n)")).as("surplus"))
    val dupLens = idx.doclens.groupBy(idCol)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(explode(expr("SEQUENCE(2, n)")).as("surplus"))
    checkRow("bm25", "ghost_postings", ghost)
      .unionAll(checkRow("bm25", "duplicate_postings", dupPost))
      .unionAll(checkRow("bm25", "duplicate_doclens", dupLens))
  }

  /** The three aggregate-state invariants; group columns come from the
    * stored `_meta.json`, the committed/retracted tag sets from their
    * sidecars. */
  def checkAggState(spark: SparkSession, dir: String): DataFrame = {
    val meta = AggState.AggStateMeta.read(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"IndexFsck.checkAggState: no _meta.json at $dir — not an " +
          "aggregate-state directory (or a torn first build)"))
    val committed = AggState.committedTags(spark, dir)
    val retracted = AggState.retractedTags(spark, dir)
    val state = spark.read.parquet(s"$dir/state")
    val orphan = state.filter(!col("__batch").startsWith("__") &&
      (if (committed.isEmpty) lit(true)
       else !col("__batch").isin(committed: _*)))
    val dup = state.groupBy((meta.groupCols :+ "__batch").map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(explode(expr("SEQUENCE(2, n)")).as("surplus"))
    val retr =
      if (retracted.isEmpty) state.limit(0)
      else state.filter(col("__batch").isin(retracted: _*))
    checkRow("agg_state", "orphan_tag_rows", orphan)
      .unionAll(checkRow("agg_state", "duplicate_partials", dup))
      .unionAll(checkRow("agg_state", "retracted_rows_present", retr))
  }

  /** The three keeper-map invariants, generic over ANY (doc_id, keeper)
    * assignment (plain table, partitioned layout, or an in-memory frame) —
    * the invariants are [[Dedup.duplicateClusters]]'s postconditions, not
    * a storage property. */
  def checkClusterAssignment(stored: DataFrame): DataFrame = {
    val above = stored.filter(col("keeper") > col("doc_id"))
    val keeperRows = stored
      .select(col("doc_id").as("__kd"), col("keeper").as("__kk"))
    val joined = stored.join(keeperRows, stored("keeper") === col("__kd"), "left")
    val dangling = joined
      .filter(col("__kk").isNull && stored("keeper") =!= stored("doc_id"))
    val notFix = joined
      .filter(col("__kk").isNotNull && col("__kk") =!= stored("keeper"))
    checkRow("cluster", "keeper_above_doc", above)
      .unionAll(checkRow("cluster", "dangling_keepers", dangling))
      .unionAll(checkRow("cluster", "keeper_not_fixpoint", notFix))
  }

  /** The three residual-IVF-PQ invariants; m comes from the stored
    * `_meta.json` (geometry is a build property, never a parameter). */
  def checkIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val m = Similarity.IvfPqMeta.read(spark, dir).map(_.m).getOrElse(
      throw new IllegalArgumentException(
        s"IndexFsck.checkIvfPq: no _meta.json at $dir — not a tagged " +
          "residual IVF-PQ index directory"))
    val idx = Similarity.IvfPqResidualIndex.read(spark, dir)
    val wrongCount = idx.codes.groupBy("__cid")
      .agg(count(lit(1)).as("n")).filter(col("n") =!= m)
    val badCell = idx.codes.join(
      idx.cent.select(col("cid").as("cell")), Seq("cell"), "left_anti")
    val dup = idx.codes.groupBy("__cid", "s")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(explode(expr("SEQUENCE(2, n)")).as("surplus"))
    checkRow("ivf_pq", "wrong_subspace_count", wrongCount)
      .unionAll(checkRow("ivf_pq", "cell_out_of_range", badCell))
      .unionAll(checkRow("ivf_pq", "duplicate_codes", dup))
  }
}
