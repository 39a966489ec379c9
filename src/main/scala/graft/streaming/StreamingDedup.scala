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
  * across executors and append-only. A production deployment bounds it
  * with a state TTL (GroupStateTimeout.ProcessingTimeTimeout) or a
  * per-bucket member cap at a documented recall trade, exactly the
  * knobs the batch scaladoc prescribes for saturated buckets.
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

  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3,
                   bands: Int = 4): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.TajoFunctions.register(spark)
    val keys = graft.operators.Dedup.simhash60PackedKeys(maxHamming, bands)
    val banded = docs
      .select(col("doc_id"), expr("simhash60(SPLIT(text, ' '))").as("simhash"))
      .filter(col("doc_id").isNotNull && col("simhash").isNotNull)
      .select(col("doc_id"), col("simhash"), explode(expr(keys)).as("bkey"))
      .as[(Long, Long, Long)]
    banded.groupByKey(_._3)
      .flatMapGroupsWithState[List[(Long, Long)], NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[List[(Long, Long)]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
          // ascending id order makes the output batch-split invariant AND
          // matches the batch operator's sorted in-bucket expansion
          rows.map(r => (r._1, r._2)).toArray.sortBy(_._1).foreach {
            case (id, sig) =>
              members.foreach { case (oid, osig) =>
                if (oid != id) {
                  val h = java.lang.Long.bitCount(sig ^ osig).toLong
                  if (h <= maxHamming)
                    out += NearDupPair(math.min(id, oid), math.max(id, oid), h)
                }
              }
              members = (id, sig) :: members
          }
          state.update(members)
          out.iterator
      }
  }
}
