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
}
