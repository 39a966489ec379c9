package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences (the concat-and-cut packing used for LLM pretraining batches:
  * documents are concatenated in a deterministic order and the stream is
  * cut every `budget` tokens; a document belongs to the sequence where it
  * starts, `offset_in_seq` says where).
  *
  * Scale design: a single global running sum would be one unpartitioned
  * window — a single-task chokepoint at 100 TB. Instead the corpus is cut
  * into deterministic id-range blocks (`blockSize` ids each) and packed
  * block-locally: one hash shuffle on the block id and a per-block window.
  * The cost is at most one partially-filled sequence per block —
  * negligible waste for blockSize >> budget — in exchange for full
  * parallelism, and the assignment is invariant to cluster layout because
  * blocks are keyed on ids, not partitions. The sequence key is the
  * composite (`pack_block`, `seq_in_block`) — collision-free by
  * construction at any token distribution. All arithmetic is exact BIGINT,
  * so the DuckDB oracle replays it bit-for-bit.
  */
object Packing {

  /** @param tokensCol per-document token count (BIGINT-compatible)
    * @param budget    tokens per packed sequence
    * @param blockSize id-range width packed independently
    *
    * Integer `div`/`%` (not floor-over-double) so block and sequence
    * arithmetic is exact over the whole BIGINT id domain; ids and token
    * counts are assumed non-negative. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, blockSize: Long): DataFrame = {
    require(budget > 0 && blockSize > 0, "budget and blockSize must be positive")
    val w = Window.partitionBy("pack_block").orderBy(col(idCol))
    df.withColumn("pack_block", expr(s"$idCol div $blockSize"))
      .withColumn("tokens_before",
        sum(col(tokensCol)).over(w) - col(tokensCol))
      .withColumn("seq_in_block", expr(s"tokens_before div $budget"))
      .withColumn("offset_in_seq", col("tokens_before") % budget)
      .drop("tokens_before")
  }

  /** Span-corruption mask plan (T5/UL2 objective prep): for each document,
    * emit the deterministic noise spans a span-corruption objective would
    * mask — `noise = n * ratePpm / 1e6` tokens split into
    * `max(1, noise / meanSpan)` spans, remainders spread one token at a
    * time over the leading spans/gaps so the layout is a pure closed-form
    * function of the token count:
    *
    *   len_k   = noise DIV spans + (k < noise % spans)
    *   gap     = (n - noise) DIV (spans + 1)  (+1 for the leading gaps)
    *   start_k = gaps(0..k) + lens(0..k-1)    (all exact BIGINT)
    *
    * Deterministic-by-construction beats sampled masks for reproducible
    * data prep: two runs (or two engines) plan identical spans, and the
    * evenly-spread layout is the fixed-span-length regime of the T5 noise
    * schedule. One row per span; documents too short for any noise token
    * (n * ratePpm < 1e6) emit none.
    *
    * Scale: a pure per-row projection + explode — no shuffle, scan speed. */
  def spanCorruptionPlan(df: DataFrame, idCol: String, tokensCol: String,
                         ratePpm: Long = 150000L, meanSpan: Long = 3L): DataFrame = {
    require(ratePpm > 0 && ratePpm < 1000000L, s"ratePpm must be in (0, 1e6), got $ratePpm")
    require(meanSpan > 0, s"meanSpan must be positive, got $meanSpan")
    df.select(col(idCol), col(tokensCol).cast("bigint").as("n_tokens"))
      .withColumn("n_noise", expr(s"(n_tokens * $ratePpm) DIV 1000000"))
      .filter(col("n_noise") > 0)
      .withColumn("n_spans", expr(s"GREATEST(CAST(1 AS BIGINT), n_noise DIV $meanSpan)"))
      .withColumn("__s", explode(expr(
        """TRANSFORM(SEQUENCE(0, CAST(n_spans AS INT) - 1), k -> STRUCT(
          |  CAST(k AS BIGINT) AS span_idx,
          |  (CAST(k AS BIGINT) + 1) * ((n_tokens - n_noise) DIV (n_spans + 1))
          |    + LEAST(CAST(k AS BIGINT) + 1, (n_tokens - n_noise) % (n_spans + 1))
          |    + CAST(k AS BIGINT) * (n_noise DIV n_spans)
          |    + LEAST(CAST(k AS BIGINT), n_noise % n_spans) AS span_start,
          |  n_noise DIV n_spans
          |    + CAST(CAST(k AS BIGINT) < n_noise % n_spans AS BIGINT) AS span_len))""".stripMargin)))
      .select(col(idCol), col("n_tokens"), col("n_noise"), col("n_spans"),
        col("__s.span_idx"), col("__s.span_start"), col("__s.span_len"))
  }

  /** Shard manifest: assign every document an EXACT global token offset in
    * a deterministic corpus order (the Knuth-hash permutation `Sampling.
    * deterministicShuffle` uses) and the output shard its first token
    * lands in (`start_token div shardTokens`) — the publish step that cuts
    * a corpus into ~shardTokens-sized training files.
    *
    * Scale design — distributed prefix sum, never a global window: a
    * cumulative sum over one global ORDER BY would plan as a
    * SinglePartition window (one task at 100 TB). Instead the permutation
    * key space [0, 2^32) is cut into `blocks` aligned ranges; pass 1
    * computes a per-block running sum (hash-partitioned window), pass 2
    * computes each block's starting offset by a window over the BLOCK
    * TOTALS — `blocks` rows, bounded by construction, so its single
    * partition is a constant-size problem — and broadcasts them back.
    * offsets are exact BIGINT; the layout is invariant to partitioning
    * because blocks are keyed on the hash value, not on partition ids. */
  def shardPlan(df: DataFrame, idCol: String, tokensCol: String,
                shardTokens: Long, blocks: Int = 256): DataFrame = {
    require(shardTokens > 0 && blocks > 0, "shardTokens and blocks must be positive")
    // same arithmetic as Sampling.knuth32: reduce mod 1e9+7 first so the
    // multiply stays exact over the whole BIGINT id domain
    val keyed = df
      .withColumn("__key", expr(s"(($idCol % 1000000007) * 2654435761) % 4294967296"))
      .withColumn("__blk", expr(s"CAST(__key * $blocks DIV 4294967296 AS INT)"))
    val inBlock = keyed.withColumn("__run",
      sum(col(tokensCol)).over(
        Window.partitionBy("__blk").orderBy(col("__key"), col(idCol))))
    val offsets = keyed.groupBy(col("__blk"))
      .agg(sum(col(tokensCol)).as("__btot"))
      .withColumn("__boff",
        coalesce(sum(col("__btot")).over(
          Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__blk"), col("__boff"))
    inBlock.join(broadcast(offsets), Seq("__blk"))
      .withColumn("start_token", col("__boff") + col("__run") - col(tokensCol))
      .withColumn("shard", expr(s"start_token DIV $shardTokens"))
      .drop("__key", "__blk", "__run", "__boff")
  }

  /** First-fit-decreasing bin packing, block-local: the waste-minimizing
    * sibling of [[packSequences]]. Concat-and-cut splits documents across
    * sequence boundaries; when training wants WHOLE documents per sequence
    * (no cross-doc attention contamination, no split docs), the problem is
    * bin packing, and FFD is the classical 11/9·OPT + 6/9 guarantee: sort
    * the block's docs by token count descending, place each into the
    * lowest-numbered bin it fits, open a new bin when none fits.
    *
    * Semantics (exact, engine-replayable): within each id-range block
    * (`idCol div blockSize`), docs ordered by (tokens DESC, id ASC) fold
    * through a first-fit scan; `ffd_bin` is 1-based in placement order. A
    * doc with tokens > budget opens its own bin, whose remaining capacity
    * goes negative so nothing else ever joins it — oversized docs are
    * isolated, not dropped (filter on tokens > budget upstream to choose a
    * different policy).
    *
    * Scale: FFD is inherently sequential, so a global FFD would be a
    * single-task chokepoint; like packSequences the corpus is cut into
    * deterministic id-range blocks and each block folds independently —
    * one hash shuffle on the block id, then a per-group SQL fold
    * (collect_list + AGGREGATE lambda) whose state is bounded by the
    * block's doc count. The cost vs global FFD is at most one extra
    * partially-filled tail of bins per block; the assignment is invariant
    * to cluster layout because blocks key on ids, not partitions. */
  def packFfd(df: DataFrame, idCol: String, tokensCol: String,
              budget: Long, blockSize: Long): DataFrame = {
    require(budget > 0 && blockSize > 0, "budget and blockSize must be positive")
    // the first-fit scan runs ONCE per placement: its result binds as a
    // lambda variable (the single-element TRANSFORM trick — SQL has no
    // `let`), so the rems-update lambda stays O(bins) instead of
    // re-evaluating an O(bins) scan per element (O(bins^2) per doc)
    val fold = s"""
      |AGGREGATE(
      |  ARRAY_SORT(COLLECT_LIST(STRUCT(-__t AS negt, __id AS id, __t AS t))),
      |  NAMED_STRUCT(
      |    'rems', CAST(ARRAY() AS ARRAY<BIGINT>),
      |    'asg',  CAST(ARRAY() AS ARRAY<STRUCT<id: BIGINT, bin: BIGINT>>)),
      |  (acc, d) -> ELEMENT_AT(TRANSFORM(
      |    ARRAY(ARRAY_POSITION(TRANSFORM(acc.rems, fr -> fr >= d.t), true)),
      |    p -> IF(p = 0,
      |      NAMED_STRUCT(
      |        'rems', CONCAT(acc.rems, ARRAY($budget - d.t)),
      |        'asg',  CONCAT(acc.asg, ARRAY(NAMED_STRUCT(
      |          'id', d.id, 'bin', CAST(SIZE(acc.rems) + 1 AS BIGINT))))),
      |      NAMED_STRUCT(
      |        'rems', TRANSFORM(acc.rems, (r, i) -> IF(i = p - 1, r - d.t, r)),
      |        'asg',  CONCAT(acc.asg, ARRAY(NAMED_STRUCT('id', d.id, 'bin', p)))))), 1))
      |""".stripMargin
    df.select(
        col(idCol).cast("bigint").as("__id"),
        col(tokensCol).cast("bigint").as("__t"),
        expr(s"$idCol div $blockSize").as("pack_block"))
      .groupBy("pack_block")
      .agg(expr(fold).as("__st"))
      .select(col("pack_block"), explode(col("__st.asg")).as("a"))
      .select(col("a.id").as(idCol), col("pack_block"),
        col("a.bin").as("ffd_bin"))
  }
}
