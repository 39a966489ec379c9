package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Continuous document ingest against a PERSISTED BM25 index — the
  * retrieval sibling of [[StreamingAnn.indexedAnnStream]] and
  * [[StreamingDedup.indexedNearDupStream]]: each micro-batch of (id, text)
  * rows folds into the stored index ([[Retrieval.appendBm25Index]] with
  * `heal = true`), and a FIXED query-term set is then re-scored against
  * the updated index, appending (n_docs_at, id, score_ppm) to a parquet
  * sink — the standing-query shape (alerting, routing, freshness-ranked
  * retrieval) where the answer must track the corpus as it grows. The
  * state is the durable index itself: arbitrarily large, restart-safe,
  * shared with batch jobs — foreachBatch for the same reason as the other
  * two loops.
  *
  * `n_docs_at` marks which index version produced each row: the doclens
  * row count AFTER the batch's fold — deterministic for an mtime-ordered
  * file stream, monotone across triggers, and exactly reproducible by a
  * batch replay over the same prefix of batches (the driver oracle
  * recomputes both steps from scratch). Scores for the SAME document
  * legitimately differ across versions (df/avgdl move as the corpus
  * grows), which is why the version column — not the score — partitions
  * the sink.
  *
  * Delivery: foreachBatch is at-least-once. The fold is replay-safe at
  * both granularities — committed docs are anti-joined out on doclens,
  * and `heal = true` closes the torn postings-without-doclens crash
  * window (see [[Retrieval.appendBm25Index]]) — so a replayed trigger
  * appends nothing and re-emits exactly the original score rows;
  * consumers dedupe the sink on (n_docs_at, id). Unique ids across the
  * corpus and every batch; not concurrent-safe with an external
  * compaction (quiesce writers, as everywhere). */
object StreamingRetrieval {

  def indexedBm25Stream(docs: DataFrame, indexDir: String, scoresDir: String,
                        queryTerms: Seq[String], idCol: String = "doc_id",
                        textCol: String = "text", topK: Int = 20)
    : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        indexedBm25Batch(batch.toDF(), indexDir, scoresDir, queryTerms,
          idCol, textCol, topK)
      }
      .start()

  /** The per-micro-batch body of [[indexedBm25Stream]], exposed (like the
    * other loops') so the replay contract is directly testable: a second
    * invocation with an already-folded batch must append NO index rows and
    * emit duplicate rows of the original scores. */
  def indexedBm25Batch(batch: DataFrame, indexDir: String, scoresDir: String,
                       queryTerms: Seq[String], idCol: String = "doc_id",
                       textCol: String = "text", topK: Int = 20): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    // one evaluation feeds the novelty anti-join, the heal semi-join, and
    // both index writes
    val b = batch.select(col(idCol), col(textCol)).localCheckpoint()
    try {
      val updated = Retrieval.appendBm25Index(b, idCol, textCol, indexDir,
        heal = true)
      val nDocs = updated.doclens.count()
      Retrieval.queryBm25Index(updated, queryTerms.toDF("term"), idCol,
          topK = topK)
        .withColumn("n_docs_at", lit(nDocs))
        .select(col("n_docs_at"), col(idCol), col("score_ppm"))
        .write.mode("append").parquet(scoresDir)
    } finally
      // trigger complete — release the per-trigger blocks (unbounded in a
      // long-lived stream otherwise; VERDICT r12 #1)
      graft.operators.Checkpoints.free(b)
    ()
  }
}
