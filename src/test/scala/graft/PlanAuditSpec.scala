package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression tests: the properties that make these queries
  * scale (pushdown, pruning, broadcast, partial aggregation, top-k pushdown,
  * single evaluation of expensive expressions) asserted against the actual
  * physical plans, so a refactor that silently loses one fails CI rather
  * than a 100 TB run. */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String = {
    val q = SparkEntry.registry.find(_.name == name).getOrElse(sys.error(s"unknown $name"))
    q.run(spark, sfDir).queryExecution.explainString(FormattedMode)
  }

  test("q1_agg: filter pushed to scan, columns pruned, two-phase agg, codegen") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters"), p)
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).nonEmpty, p)
    // pruned scan: only the 7 referenced columns, not the full 11-col table
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(readSchema.split(",").length <= 7, readSchema)
    assert(!readSchema.contains("l_orderkey"), readSchema)
    // partial + final hash aggregate
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // codegen spans only materialize in the executed plan; under AQE they
    // render as the "*(n)" stage markers
    val q = SparkEntry.registry.find(_.name == "q1_agg").get.run(spark, sfDir)
    q.collect()
    val ep = q.queryExecution.executedPlan.toString
    assert(ep.contains("*(") && ep.contains("partial_sum"), ep)
  }

  test("q5_join_multi: all five dims broadcast at this scale") {
    val p = plan("q5_join_multi")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 5, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q6_forecast_revenue: every predicate reaches the parquet scan") {
    val p = plan("q6_forecast_revenue")
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p).get.group(1)
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(pushed.contains(c), s"$c not pushed: $pushed"))
  }

  test("q_sort_limit: top-k runs as TakeOrderedAndProject, not a global sort") {
    val p = plan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("minhash pipeline evaluates the signature expression exactly once") {
    val p = plan("q_dedup_minhash_pairs")
    assert("minhash_sig\\(".r.findAllIn(p).size == 1, p)
  }

  test("q_dedup_exact: partial aggregation before the digest shuffle") {
    val p = plan("q_dedup_exact")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("hashpartitioning".r.findAllIn(p).size >= 1, p)
  }

  test("q_text_quality: pure per-row projection — no join, no aggregate") {
    val p = plan("q_text_quality")
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
    // scan reads only the two referenced columns of the 4-column table
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("source") && !readSchema.contains("lang"), readSchema)
  }

  test("q_pipeline_sample: scan pruned to the projected columns") {
    val p = plan("q_pipeline_sample")
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(readSchema.split(",").length == 2, readSchema) // doc_id, source only
    assert(!p.contains("Join"), p)
  }

  test("q_ann_ivf: no cartesian product on data-sized inputs") {
    // the only nested-loop join is corpus x broadcast(K centroids) — K rows,
    // independent of data size; the candidate join must be a cell equi-join
    val p = plan("q_ann_ivf")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("cell"), p)
  }

  test("q_dedup_exact_norm: native norm_text in the plan, not a regex chain") {
    val p = plan("q_dedup_exact_norm")
    assert(p.contains("norm_text"), p)
    assert(!p.contains("regexp_replace"), p)
  }

  test("q_pipeline_end_to_end: one dedup aggregate, native norm, no cartesian") {
    val p = plan("q_pipeline_end_to_end")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("norm_text"), p)
    // dedup keepers = partial+final hash aggregate on the norm digest; the
    // final mix count adds its own partial+final pair
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("q_pipeline_split: narrow split assignment, exactly one exchange (the agg)") {
    val p = plan("q_pipeline_split")
    // the split column is a projection over the scan — the only shuffles
    // are the partial->final aggregate boundary and the final ORDER BY
    // (formatted mode names each node twice: tree + details, so 2 exchange
    // nodes = 4 mentions); more would mean the assignment itself
    // repartitioned the corpus
    assert("Exchange".r.findAllIn(p).size <= 4, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_text_cdc: native cdc_chunks with generator, no join, no extra shuffle") {
    val p = plan("q_text_cdc")
    assert(p.contains("cdc_chunks"), p)
    assert(p.contains("Generate"), p) // posexplode stays a generator, not a join
    assert(!p.contains("Join"), p)
    // sort for the ORDER BY is the only exchange (1 node = 2 formatted-mode
    // mentions)
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("q_text_repetition: per-row fold — no generator, no join, no aggregate") {
    val p = plan("q_text_repetition")
    assert(!p.contains("Generate"), p)   // no explode of (doc, token) pairs
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"), p)
    // the ORDER BY is the only exchange (1 node = 2 formatted-mode mentions)
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("q_text_top_ngrams: partial agg on the ngram, top-k not a global sort") {
    val p = plan("q_text_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
    assert(!p.contains("Join"), p)
  }

  test("q_text_tfidf: vocab broadcast bounded by top-V cap, corpus shuffles only for its two aggs") {
    val p = plan("q_text_tfidf")
    // the df side is capped to maxVocab rows (top-V by df) BEFORE the
    // broadcast hint, so an unbounded web-scale vocabulary (Heaps' law)
    // can never OOM the broadcast — the cap shows up as a top-k node
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
    // every hash exchange is an aggregation's own ENSURE_REQUIREMENTS shuffle
    // — tf (statically duplicated for the df side, reused at runtime), the
    // term df agg, and the countDistinct(doc_id) — the join itself must add
    // NO shuffle of the big side (no SMJ; trailing ORDER BY is range, not hash)
    assert("hashpartitioning".r.findAllIn(p).size <= 4, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_ann_pq: codebook and ADC table broadcast, corpus scan never cartesian") {
    val p = plan("q_ann_pq")
    // the codebook (m * 2^nBits rows) and the query distance table
    // (queries * m * 2^nBits rows) are the only broadcast sides; the
    // corpus joins them by key — no data-sized broadcast, no cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_ann_ivfpq: composed index keeps every data-sized join an equi-join") {
    val p = plan("q_ann_ivfpq")
    // centroids/codebooks/ADC broadcast (bounded); the candidate scan must
    // join by (subspace, code, cell) keys — never a cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_op_semdedup: pair join is per-cluster equi, centroids are the only cross join") {
    val p = plan("q_op_semdedup")
    // the only nested-loop joins are against the K-row centroid table
    // (bounded by construction: K = 2^nBits); the near-dup pair join must
    // be an equi-join on the cell id, never corpus x corpus
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("cell"), p)
  }

  test("q_op_hard_negatives: pair join equi on the cell, centroids the only cross join") {
    val p = plan("q_op_hard_negatives")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("cell"), p)
    // per-anchor top-k runs through the rank-filter pushdown
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_op_semantic_sort: assignment phase never joins data-sized inputs") {
    val p = plan("q_op_semantic_sort")
    assert(!p.contains("CartesianProduct"), p)
    // formatted mode prints each node twice (tree + details): one centroid
    // cross join = 2 mentions
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
  }

  test("q_dedup_simhash_pairs: banded equi-join, never an all-pairs comparison") {
    val p = plan("q_dedup_simhash_pairs")
    // pigeonhole band join: pairs come from an equi-join on the (band,
    // slice) key — a cartesian/nested-loop self-join would be O(n^2) rows
    // at any scale
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("band"), p)
  }

  test("q_text_lm_score: model-side joins carry no forced broadcast of unbounded tables") {
    val p = plan("q_text_lm_score")
    // the only nested-loop join is the 1-row vocabulary-size scalar (one
    // node = 2 mentions in formatted explain: tree + details); the count
    // tables join by key, so an unbounded vocabulary degrades to a
    // shuffle join instead of an OOM (the TF-IDF lesson)
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
  }

  test("q_pipeline_pack: window is partitioned (hash on pack_block), never global") {
    val p = plan("q_pipeline_pack")
    // the running sum must shuffle on the block key — an unpartitioned
    // window would be a SinglePartition exchange (one task at 100 TB)
    assert(p.contains("hashpartitioning(pack_block"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Join"), p)
  }

  test("q_pipeline_pack_ffd: one hash shuffle on the block id, no global fold") {
    val p = plan("q_pipeline_pack_ffd")
    // each block folds independently after one exchange on pack_block; a
    // global FFD would appear as a SinglePartition exchange (one task)
    assert(p.contains("hashpartitioning(pack_block"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Join"), p)
  }

  test("incrementalBloom: seen side never shuffles — broadcast semi/anti only") {
    import org.apache.spark.sql.functions._
    val docs = graft.engine.Tables.table(spark, sfDir, "documents")
    val seen = docs.filter(col("doc_id") < 300).select(md5(col("text")).as("digest"))
    val batch = docs.filter(col("doc_id") >= 250)
    val out = graft.operators.Dedup.incrementalBloom(batch, seen, "doc_id", "text",
      expectedItems = 4096, fpp = 0.01)
    val p = out.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // both the confirm semi join and the final anti join must be broadcast
    // joins (candidates / confirmed dups are the small, bounded sides);
    // a SortMergeJoin here would mean the trillion-digest seen table
    // shuffles every batch — the exact pattern this operator exists to avoid
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin LeftSemi".r.findFirstIn(p).nonEmpty ||
      "LeftSemi BuildRight".r.findFirstIn(p).nonEmpty, p)
    assert("LeftAnti".r.findFirstIn(p).nonEmpty, p)
    // the only hash shuffles are digest-keyed aggregations (in-batch keeper
    // rule + candidate distinct), never a join input
    assert(!p.contains("hashpartitioning(doc_id"), p)
  }

  test("q_pipeline_dsir: model sides aggregate partial+final; corpus grams explode once per side") {
    val p = plan("q_pipeline_dsir")
    // partial + final count aggregation on the bucket id for both model
    // tables and the per-doc sum (the map-side combine that keeps the
    // shuffle bounded by distinct buckets, not gram occurrences)
    assert("partial_count".r.findAllIn(p).size >= 2, p)
    // one Generate (explode) per corpus/target/raw side — a regression that
    // re-explodes grams per join input would multiply scan cost
    assert("Generate explode".r.findAllIn(p).size <= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_pipeline_shard_plan: corpus running sum is hash-partitioned by block") {
    val p = plan("q_pipeline_shard_plan")
    // the data-sized window must shuffle on the block key; the only
    // SinglePartition exchange is the block-offsets window, bounded at
    // `blocks` rows by construction
    assert(p.contains("hashpartitioning(__blk"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q_pipeline_topk_per_group: rank filter pushed into the window sort, no join") {
    val p = plan("q_pipeline_topk_per_group")
    // Spark rewrites rn <= k over a window into WindowGroupLimit, so each
    // group keeps only k rows before the final window evaluation
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("Join"), p)
  }

  test("q_dedup_substring_spans: single-pass windows, shuffles only on hash and doc key") {
    val p = plan("q_dedup_substring_spans")
    // the repeated-hash predicate is a windowed COUNT over __h — the
    // explode+md5 window table is evaluated ONCE and never self-joined
    // (the agg+join spelling re-evaluated it and shuffled a third time)
    assert(!p.contains("Join"), p)
    assert(p.contains("hashpartitioning(__h"), p)
    assert(p.contains("hashpartitioning(doc_id"), p)
    // the island merge still ends in a partial+final aggregate
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_pipeline_shuffle: head of the permutation is a top-k, not a global sort") {
    val p = plan("q_pipeline_shuffle")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q_op_multimodal_decode: per-image work is spread by an exchange, not one scan split") {
    val p = plan("q_op_multimodal_decode")
    // the id column arrives as a single small parquet split; without a
    // repartition before the encode/decode mapPartitions the whole image
    // pipeline runs in ONE task (the round-5 10s-per-query regression)
    assert(p.contains("RoundRobinPartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q_func_python_batch: batched bridge adds no exchange before the python map") {
    // mapColumn is a narrow mapPartitions over the scan; the only exchange
    // allowed is the final presentation ORDER BY (rangepartitioning) —
    // the corpus never shuffles INTO the python stage
    val p = plan("q_func_python_batch")
    assert(!p.contains("hashpartitioning"), p) // nothing shuffles into the python map
    assert(p.contains("MapPartitions"), p)
  }

  test("python two-stage aggregate shuffles only (group, partial) rows") {
    // stage 1 output is one row per (partition, group); the single
    // hashpartitioning exchange between the two python stages moves
    // partials, never corpus rows
    val docs = graft.engine.Tables.table(spark, sfDir, "nation")
    val agg = graft.functions.PythonUdf.PyAgg("SumCountPy", 1,
      org.apache.spark.sql.types.DoubleType)
    val script = {
      val src =
        """class SumCountPy:
          |    def __init__(self):
          |        self.s = 0
          |        self.n = 0
          |    def eval(self, x):
          |        if x is not None:
          |            self.s += x
          |            self.n += 1
          |    def get_partial_result(self):
          |        return [self.s, self.n]
          |    def merge(self, p):
          |        if p:
          |            self.s += p[0]
          |            self.n += p[1]
          |    def get_final_result(self):
          |        return None if self.n == 0 else self.s / float(self.n)
          |""".stripMargin
      val f = java.nio.file.Files.createTempFile("plan-audit-pyudaf", ".py")
      java.nio.file.Files.write(f, src.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.deleteOnExit(); f.toString
    }
    val out = graft.functions.PythonUdf.aggregate(docs, script, agg,
      Seq("n_regionkey"), Seq("n_nationkey"), "avg_key")
    val p = out.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("hashpartitioning"), p)
    // both python stages present: partial fold + final merge, and Spark
    // even partial-aggregates the collect_list before the shuffle
    assert("MapPartitions".r.findAllIn(p).size >= 2, p)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_op_url_dedup: canonicalization at scan speed, ONE shuffle on the canonical URL") {
    val p = plan("q_op_url_dedup")
    // per-row regex projection + partial/final hash agg; the only exchanges
    // are the dedup hashpartitioning and the final presentation sort
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("hashpartitioning(canonical_url"), p)
    // two exchanges total: the dedup hashpartitioning + the ORDER BY range
    // sort for presentation; exactly one hash shuffle
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 2, p)
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q_op_hll_tokens: sketches aggregate partial+final, only sketch bytes shuffle") {
    val p = plan("q_op_hll_tokens")
    // HLL sketch agg is object-hash-aggregated: per-partition partial
    // sketches merge after a shuffle of k-byte sketches, never raw tokens;
    // two levels (per-shard, then union per-source / rollup)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_op_robots_gate: rules broadcast to the corpus, corpus never sort-merge-joins itself") {
    val p = plan("q_op_robots_gate")
    // the rules side is dimension-sized and explicitly broadcast; the only
    // window is partitioned by the URL id (per-URL match ranking)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_op_inverted_index: posting cap pushed into the window sort (WindowGroupLimit)") {
    val p = plan("q_op_inverted_index")
    assert(p.contains("WindowGroupLimit"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_op_bm25: query terms broadcast, top-k is TakeOrderedAndProject, no global sort") {
    val p = plan("q_op_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_store_dpp: dim-side filter prunes fact partitions at runtime") {
    val p = plan("q_store_dpp")
    // the fact scan's PartitionFilters must carry a dynamicpruning
    // expression fed by the filtered dim — static pruning cannot see
    // through the join, so its absence means the full fact scans
    assert(p.toLowerCase.contains("dynamicpruning"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_op_interval_join: grid overlap join stays an equi-join, no nested loop") {
    val p = plan("q_op_interval_join")
    // the bucket explode turns interval overlap into an equi-join on
    // (key, bucket) with residual filters — a cartesian or BNLJ here means
    // the grid rewrite silently degraded to the O(n*m) plan it exists to avoid
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Generate"), p) // the bucket explode stays a generator
  }

  test("q_store_jdbc_agg: aggregate + top-N composed into the remote Derby SQL") {
    val p = plan("q_store_jdbc_agg")
    // the GROUP BY aggregation runs inside Derby: the v2 scan carries the
    // pushed aggregate functions and group-by expressions — without them
    // the whole remote table streams through the JDBC pipe
    assert(p.contains("PushedAggregates"), p)
    assert("PushedAggregates: \\[[^\\]]*COUNT".r.findFirstIn(p).nonEmpty, p)
    assert("PushedAggregates: \\[[^\\]]*MAX".r.findFirstIn(p).nonEmpty, p)
    assert(p.contains("PushedGroupByExpressions"), p)
    // ORDER BY + LIMIT pushes as remote top-N (GraftDerbyDialect's
    // FETCH FIRST clause) — only 10 rows cross the wire
    assert(p.contains("PushedTopN") || p.contains("PushedLimit"), p)
  }

  test("pageRank iteration: contribution sum is partial+final on dst, rank table stays node-sized") {
    // pin the per-iteration subplan (the registered query's final plan is
    // checkpoint scans by design — lineage truncation IS the discipline)
    import org.apache.spark.sql.functions._
    val edges = graft.engine.Tables.table(spark, sfDir, "documents").limit(200)
      .select(concat(lit("s"), col("doc_id") % 7).as("src"),
        concat(lit("d"), col("doc_id") % 11).as("dst"), lit(1L).as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val wout = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val rank = edges.select(col("src").as("d")).distinct.withColumn("r", lit(1000L))
    val contrib = edges.join(wout, "src").join(rank, col("src") === col("d"))
      .select(col("dst"), expr("r * w DIV wout").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
    val p = contrib.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
