package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming near-duplicate detection — the ingest-time spelling of
  * [[graft.operators.Dedup.simhashNearDupsWide]], for the pipeline that
  * cannot wait for a batch pass: documents arrive continuously and every
  * arrival must be checked against everything already ingested.
  *
  * Same algorithm, incremental state: each document expands to the SAME
  * two-level packed band keys as the batch operator
  * ([[graft.operators.Dedup.simhash60PackedKeys]] — shared builder, so the
  * two spellings cannot drift), rows group by key, and a typed
  * `flatMapGroupsWithState` holds each bucket's (id, signature) members.
  * A new arrival emits one pair per stored member within `maxHamming`
  * bits; by the batch operator's two-level pigeonhole argument, every
  * qualifying pair shares at least one packed key, so the emitted pair
  * SET (after the cross-band distinct) equals the batch operator's output
  * exactly — the DuckDB brute-force oracle that gates the batch query
  * gates this one too.
  *
  * Micro-batch-split invariance: within a batch, a bucket's rows are
  * processed in ascending id order, each compared against prior state AND
  * earlier same-batch rows before being appended — so how the stream is
  * chopped into triggers cannot change the output set
  * (`StreamingSpec` pins 1-batch == 2-batch == batch-operator).
  *
  * Scale: state per bucket is its member list (16 bytes each) — the same
  * population the batch operator collects per bucket, sharded by key
  * across executors. Unbounded by default (exact batch parity), it is
  * BOUNDED by two independent knobs, because a stream has no natural end
  * and per-bucket memory must not grow with stream lifetime:
  *
  *  - `ttlMs` > 0 wires `GroupStateTimeout.ProcessingTimeTimeout`: a
  *    bucket whose key receives no arrivals for `ttlMs` is dropped whole
  *    at the next trigger. Recall trade: a pair whose two members arrive
  *    more than `ttlMs` apart (with no other traffic on their shared
  *    buckets) is missed — the standard freshness-horizon semantics of
  *    windowed streaming dedup.
  *  - `maxMembers` > 0 caps each bucket's list, evicting the OLDEST
  *    members first (arrival order, newest kept). Recall trade: a pair is
  *    missed only if, on EVERY bucket the two signatures share, the
  *    earlier member was evicted before the later one arrived — emitted
  *    pairs are always a subset of the batch operator's, and every
  *    suppressed pair involves an evicted member (`StreamingSpec` pins
  *    both properties against a replay of the eviction rule).
  *
  * Both default off, so the shipped `q_stream_neardup` query stays
  * bit-equal to the batch operator and its brute-force oracle.
  *
  * Engine note on the TTL: with `ProcessingTimeTimeout` configured, Spark
  * schedules micro-batches CONTINUOUSLY to sweep expired groups
  * (`FlatMapGroupsWithStateExec.shouldRunAnotherBatch` is unconditionally
  * true), so the query never reports quiescence —
  * `StreamingQuery.processAllAvailable()` blocks forever. Drive a
  * TTL-enabled stream by progress or `awaitTermination(timeout)`
  * (`StreamingSpec` shows the pattern); leave `ttlMs = 0` for
  * run-to-completion batch-parity jobs.
  */
object StreamingDedup {

  /** Schema of the streamed documents table (TESTDATA.md). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory's documents parquet. */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  final case class NearDupPair(d1: Long, d2: Long, hamming: Long)

  final case class MinhashPair(d1: Long, d2: Long, sig_matches: Long)

  /** The ONE bucket state machine behind both streaming near-dup
    * spellings — simhash and minhash differ only in the member payload
    * `S` and the `score` predicate, so the split-invariance ordering,
    * the oldest-first `maxMembers` eviction, and the TTL handling are
    * identical BY CONSTRUCTION (the member-cap and TTL specs exercise
    * them through the simhash spelling; this sharing is what makes those
    * results carry to minhash). `score` returns Some(value) when the
    * pair qualifies. */
  private def bucketPairFn[K, S, T](
      maxMembers: Int, ttlMs: Long, score: (S, S) => Option[Long],
      mk: (Long, Long, Long) => T)
    : (K, Iterator[(Long, S)], GroupState[List[(Long, S)]]) => Iterator[T] =
    (_, rows, state) =>
      if (state.hasTimedOut) {
        // idle past the TTL: drop the whole bucket (rows is empty here)
        state.remove()
        Iterator.empty
      } else {
        // members newest-first: prepend on arrival, so a cap keeps the
        // most recent maxMembers and evicts the oldest
        var members = state.getOption.getOrElse(Nil)
        val out = scala.collection.mutable.ArrayBuffer.empty[T]
        // ascending id order makes the output batch-split invariant AND
        // matches the batch operators' sorted in-bucket expansion
        rows.toArray.sortBy(_._1).foreach { case (id, s) =>
          members.foreach { case (oid, os) =>
            if (oid != id)
              score(s, os).foreach(v =>
                out += mk(math.min(id, oid), math.max(id, oid), v))
          }
          members = (id, s) :: members
          if (maxMembers > 0 && members.lengthCompare(maxMembers) > 0)
            members = members.take(maxMembers)
        }
        state.update(members)
        if (ttlMs > 0L) state.setTimeoutDuration(ttlMs)
        out.iterator
      }

  private def stateTimeout(ttlMs: Long): GroupStateTimeout =
    if (ttlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout

  /** Ingest-time MinHash-LSH near-duplicate detection — the Jaccard
    * sibling of [[nearDupPairs]] (which is hamming-over-simhash): each
    * arrival expands to the SAME banded signature keys as the batch
    * operator ([[graft.operators.Dedup.minhashBandStructs]] — shared
    * builder, the spellings cannot drift), rows group by (band,
    * band_key), and each bucket's state holds its members' (id, full
    * k-long signature). A new arrival emits one pair per stored member
    * agreeing on >= `minMatches` of the k positions (E[agreement] =
    * Jaccard — the MinHash estimator, so minMatches/k is the similarity
    * threshold); cross-band duplicates collapse at the sink (`distinct`),
    * after which the pair set equals the batch composition
    * candidates-then-verify exactly (`StreamingSpec`).
    *
    * Restricted to `rowsPerBand == 2` (the packed BIGINT band key —
    * see [[graft.operators.Dedup.minhashBands]]'s type note): streaming
    * state keys must be one concrete type, and the packed spelling is
    * also the one that shuffles cheapest. State per bucket member is
    * id + k longs (~136 B at k=16); the same `maxMembers`/`ttlMs` bounds
    * as [[nearDupPairs]] apply, with the same recall semantics, and the
    * same ProcessingTimeTimeout quiescence gotcha when `ttlMs` > 0. */
  def minhashNearDupPairs(docs: DataFrame, k: Int = 16, shingleN: Int = 3,
                          bands: Int = 8, minMatches: Int = 8,
                          maxMembers: Int = 0,
                          ttlMs: Long = 0L): Dataset[MinhashPair] = {
    require(bands * 2 == k,
      s"streaming minhash uses rowsPerBand = 2: bands * 2 must equal k, got $bands * 2 != $k")
    require(minMatches >= 1 && minMatches <= k,
      s"minMatches must be in [1, $k], got $minMatches")
    require(maxMembers >= 0, s"maxMembers must be >= 0 (0 = unbounded), got $maxMembers")
    require(ttlMs >= 0L, s"ttlMs must be >= 0 (0 = no timeout), got $ttlMs")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.TajoFunctions.register(spark)
    val keys = graft.operators.Dedup.minhashBandStructs(bands, rowsPerBand = 2)
    val timeout = stateTimeout(ttlMs)
    val score: (Seq[Long], Seq[Long]) => Option[Long] = (sig, osig) => {
      var m = 0
      var i = 0
      while (i < sig.length) {
        if (sig(i) == osig(i)) m += 1
        i += 1
      }
      if (m >= minMatches) Some(m.toLong) else None
    }
    val fn = bucketPairFn[(Long, Long), Seq[Long], MinhashPair](
      maxMembers, ttlMs, score, MinhashPair.apply)
    docs
      .select(col("doc_id"), expr(s"minhash_sig(text, $k, $shingleN)").as("sig"))
      .filter(col("doc_id").isNotNull && col("sig").isNotNull)
      .select(col("doc_id"), col("sig"), explode(expr(keys)).as("__b"))
      .select(col("doc_id"), col("sig"),
        col("__b.band").as("band"), col("__b.band_key").as("band_key"))
      .as[(Long, Seq[Long], Long, Long)]
      .groupByKey(r => (r._3, r._4))
      .mapValues(r => (r._1, r._2))
      .flatMapGroupsWithState[List[(Long, Seq[Long])], MinhashPair](
        OutputMode.Append, timeout)(fn)
  }

  /** Continuous ingest against a PERSISTED MinHash index — the streaming
    * spelling of the incremental-dedup loop
    * ([[graft.operators.Dedup.incrementalNearDups]] +
    * [[graft.operators.Dedup.appendMinhashIndex]]): each micro-batch is
    * checked against the index at `indexDir` AS OF THE BATCH START, its
    * near-dup pairs append to `pairsDir` (parquet), and the batch then
    * folds into the index so the NEXT micro-batch dedupes against it too.
    *
    * foreachBatch is the right vehicle because the loop's state IS the
    * persisted index — arbitrarily large, durable across restarts, and
    * shared with batch jobs — the opposite trade from
    * [[minhashNearDupPairs]], whose in-executor bucket state is fast but
    * bounded by TTL/caps and private to the query. Pairs BETWEEN two
    * documents of the same micro-batch are deliberately out of scope
    * (they are in-batch dedup — run [[graft.operators.Dedup.minhashCandidates]]
    * on the batch); this operator's contract is batch-vs-everything-
    * already-ingested, which makes its output the exact sequential
    * composition of the batch operators (spec- and oracle-pinned).
    *
    * Delivery: foreachBatch is at-least-once under retries. Both halves
    * tolerate a replay — the index append is idempotent at read time
    * (duplicate rows collapse through the verify join / compaction), and
    * the pair check anti-joins out candidates whose corpus_id is IN the
    * current batch: on a replay the crashed attempt's append has already
    * folded the batch into the index, so without that guard the rerun
    * would emit brand-new within-batch pairs the clean run never produces
    * (violating the sequential-composition contract, not just duplicating
    * rows). With it, a replay emits exactly the original pair rows, and
    * consumers dedupe on (new_id, corpus_id) (the shipped query does).
    * On a clean run the guard is a no-op by construction (batch ids are
    * not yet in the index). Not concurrent-safe with an external
    * compaction (the standard quiesce-writers contract). */
  def indexedNearDupStream(docs: DataFrame, indexDir: String, pairsDir: String,
                           k: Int = 16, shingleN: Int = 3, bands: Int = 8,
                           rowsPerBand: Int = 2, minMatches: Int = 8)
    : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        indexedNearDupBatch(batch.toDF(), indexDir, pairsDir,
          k, shingleN, bands, rowsPerBand, minMatches)
      }
      .start()

  /** The per-micro-batch body of [[indexedNearDupStream]], exposed so the
    * at-least-once contract is directly testable: invoking it AGAIN with
    * an already-applied batch (the engine's replay after a crash) must
    * emit exactly the original pair rows — `StreamingSpec` pins that. */
  // shared preamble of both foreachBatch bodies: fail-fast param checks,
  // index read + build-tag validation, ONE materialized evaluation of the
  // batch signature pipeline, and the replay-guarded cross-pair check —
  // extracted so the two streaming loops cannot drift (same discipline as
  // bucketPairFn for the in-executor spellings)
  private def checkedBatch(batch: DataFrame, indexDir: String, k: Int,
                           shingleN: Int, bands: Int, rowsPerBand: Int,
                           minMatches: Int)
    : (graft.operators.Dedup.MinhashIndex, DataFrame, DataFrame, DataFrame) = {
    require(bands * rowsPerBand == k,
      s"bands * rowsPerBand must equal k, got $bands * $rowsPerBand != $k")
    require(minMatches >= 1 && minMatches <= k,
      s"minMatches must be in [1, $k], got $minMatches")
    val idx = graft.operators.Dedup.MinhashIndex.read(batch.sparkSession, indexDir)
    idx.requireParams(k, shingleN, bands, rowsPerBand)
    val bsigs = graft.operators.Dedup
      .minhashSignature(batch, "doc_id", "text", k, shingleN).localCheckpoint()
    val bband = graft.operators.Dedup.minhashBands(bsigs, "doc_id", bands, rowsPerBand)
    val cross = graft.operators.Dedup
      .bandJoinVerify(idx, bsigs, bband, "doc_id", k, minMatches)
      // replay guard (see indexedNearDupStream scaladoc): pairs against
      // the batch's OWN ids can only exist when a crashed attempt already
      // appended this batch — excluding them makes the replay emit exactly
      // the original rows; a no-op on a clean run. The using-join hoists
      // the key column first; restore the documented column order.
      .join(bsigs.select(col("doc_id").as("corpus_id")), Seq("corpus_id"), "left_anti")
      .select("new_id", "corpus_id", "sig_matches", "est_jaccard")
    (idx, bsigs, bband, cross)
  }

  def indexedNearDupBatch(batch: DataFrame, indexDir: String, pairsDir: String,
                          k: Int = 16, shingleN: Int = 3, bands: Int = 8,
                          rowsPerBand: Int = 2, minMatches: Int = 8): Unit = {
    val (_, bsigs, _, cross) =
      checkedBatch(batch, indexDir, k, shingleN, bands, rowsPerBand, minMatches)
    try
      // the pair-sink write and the index fold are INDEPENDENT given the
      // checkpointed batch signatures and the pre-append index read inside
      // checkedBatch (the cross plan's file listing is pinned there; the
      // fold only ADDS part files), so they run as two concurrent jobs
      // (guide §2.6) — the crash shape this can produce (batch folded,
      // pairs not yet written) is the documented at-least-once replay
      // case: the replay appends nothing and the replay guard re-emits
      // exactly the original pair rows
      graft.operators.Jobs.concurrently(
        () => cross.write.mode("append").parquet(pairsDir),
        () => graft.operators.Dedup.appendMinhashIndexFromSigs(
          bsigs, "doc_id", indexDir, k, shingleN, bands, rowsPerBand))
    finally
      // trigger complete — without this the loop pins one batch-sized
      // signature table PER TRIGGER, unbounded in a long-lived stream
      // (VERDICT r12 #1)
      graft.operators.Checkpoints.free(bsigs)
    ()
  }

  /** [[indexedNearDupStream]] plus DURABLE CLUSTER MAINTENANCE: each
    * micro-batch is checked against the persisted index (pairs append to
    * `pairsDir` under the same replay guard), the persisted cluster state
    * at `indexDir/clusters` absorbs the batch's pairs — cross AND
    * in-batch, the full uniform pair definition — via
    * [[graft.operators.Dedup.foldClusterState]], and the batch then folds
    * into the index. After N triggers the stored assignment equals the
    * batch recompute over everything ingested (oracle-pinned), but each
    * trigger paid only batch-sized work: the streaming answer to "keep
    * the keeper map current under continuous ingest" at 100 TB.
    *
    * Requires the cluster state to be seeded first
    * ([[graft.operators.Dedup.writeClusterState]] at index build time).
    * At-least-once: a replayed batch re-derives the SAME cross pairs
    * (the replay guard strips pairs against the batch's own appended
    * ids) and the same in-batch pairs, and re-folding already-folded
    * pairs is a no-op — contraction maps both endpoints of every pair
    * into the cluster they already share, so the merge CC returns each
    * touched keeper to itself (spec-pinned). Same quiesce-writers
    * contract as the index lifecycle. */
  def indexedClusterStream(docs: DataFrame, indexDir: String, pairsDir: String,
                           k: Int = 16, shingleN: Int = 3, bands: Int = 8,
                           rowsPerBand: Int = 2, minMatches: Int = 8)
    : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        indexedClusterBatch(batch.toDF(), indexDir, pairsDir,
          k, shingleN, bands, rowsPerBand, minMatches)
      }
      .start()

  /** The per-micro-batch body of [[indexedClusterStream]], exposed (like
    * [[indexedNearDupBatch]]) so the replay contract is directly
    * testable: a second invocation with an already-applied batch must
    * leave the cluster state unchanged and emit the original pair rows. */
  def indexedClusterBatch(batch: DataFrame, indexDir: String, pairsDir: String,
                          k: Int = 16, shingleN: Int = 3, bands: Int = 8,
                          rowsPerBand: Int = 2, minMatches: Int = 8): Unit = {
    val (_, bsigs, bband, cross0) =
      checkedBatch(batch, indexDir, k, shingleN, bands, rowsPerBand, minMatches)
    // materialized once: written to the pair sink AND folded below
    val cross = cross0.localCheckpoint()
    try
      // the pair-sink write is INDEPENDENT of the fold-then-append chain
      // (both sides consume the cross CHECKPOINT, not the live plan; the
      // chain's two index-dir writers stay ordered in their task — they
      // share the index write lease), so the two run as concurrent jobs
      // (guide §2.6); same replay reasoning as indexedNearDupBatch for the
      // crash shapes concurrency adds
      graft.operators.Jobs.concurrently(
        () => cross.write.mode("append").parquet(pairsDir),
        () => {
          val inBatch = graft.operators.Dedup.batchNearDupPairsFromSigs(
            bsigs, bband, "doc_id", minMatches)
          graft.operators.Dedup.foldClusterState(batch.sparkSession, indexDir,
            cross, inBatch, minMatches)
          graft.operators.Dedup.appendMinhashIndexFromSigs(
            bsigs, "doc_id", indexDir, k, shingleN, bands, rowsPerBand)
        })
    finally
      // trigger complete — release the per-trigger blocks (see
      // indexedNearDupBatch; the fold frees its own cross/inb projections)
      graft.operators.Checkpoints.free(bsigs, cross)
    ()
  }

  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3, bands: Int = 4,
                   maxMembers: Int = 0, ttlMs: Long = 0L): Dataset[NearDupPair] = {
    require(maxMembers >= 0, s"maxMembers must be >= 0 (0 = unbounded), got $maxMembers")
    require(ttlMs >= 0L, s"ttlMs must be >= 0 (0 = no timeout), got $ttlMs")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.TajoFunctions.register(spark)
    val keys = graft.operators.Dedup.simhash60PackedKeys(maxHamming, bands)
    val timeout = stateTimeout(ttlMs)
    val score: (Long, Long) => Option[Long] = (sig, osig) => {
      val h = java.lang.Long.bitCount(sig ^ osig).toLong
      if (h <= maxHamming) Some(h) else None
    }
    val fn = bucketPairFn[Long, Long, NearDupPair](
      maxMembers, ttlMs, score, NearDupPair.apply)
    docs
      .select(col("doc_id"), expr("simhash60(SPLIT(text, ' '))").as("simhash"))
      .filter(col("doc_id").isNotNull && col("simhash").isNotNull)
      .select(col("doc_id"), col("simhash"), explode(expr(keys)).as("bkey"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .mapValues(r => (r._1, r._2))
      .flatMapGroupsWithState[List[(Long, Long)], NearDupPair](
        OutputMode.Append, timeout)(fn)
  }
}
