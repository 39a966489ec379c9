package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IndexFsck, IndexRepair, Retrieval, Similarity}

/** IndexRepair — the apply mode of IndexFsck. The registry query
  * q_op_index_repair oracle-gates the full planted-corruption loop at both
  * scale factors; this spec pins the API-level contracts the query shape
  * can't isolate: a repair on a CLEAN index is a no-op (reports all zeros,
  * membership unchanged — an over-eager repair that drops healthy rows is
  * worse than no repair), the drop-set functions name exactly the partial
  * ids, and the cluster re-solve preserves singletons and connectivity. */
class IndexRepairSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private lazy val docs = graft.engine.Tables.table(spark, sfDir, "documents")
    .filter(col("doc_id") < 120).select("doc_id", "text")

  private def reportMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  test("repair of a clean BM25 index is a no-op: zero report, membership intact") {
    val dir = scratch("rep_bm25")
    Retrieval.writeBm25Index(docs, "doc_id", "text", dir, termShards = 4)
    val before = spark.read.parquet(s"$dir/postings").count()
    val rep = reportMap(IndexRepair.repairBm25Index(spark, dir, termShards = 4))
    assert(rep.values.forall(_ == 0L), s"clean repair reported work: $rep")
    assert(spark.read.parquet(s"$dir/postings").count() == before)
    assert(IndexFsck.checkBm25(spark, dir).agg(sum("violations"))
      .collect().head.getLong(0) == 0L)
  }

  test("minhashInconsistentIds names exactly the partial ids; repair + re-append restores membership") {
    val dir = scratch("rep_mh")
    Dedup.writeMinhashIndex(docs, "doc_id", "text", dir)
    assert(IndexRepair.minhashInconsistentIds(spark, dir).isEmpty)
    // torn append: sigs landed, bands never did
    val torn = graft.engine.Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id").between(120, 129)).select("doc_id", "text")
    Dedup.minhashSignature(torn, "doc_id", "text")
      .write.mode("append").parquet(s"$dir/sigs")
    val tornIds = torn.select("doc_id").as[Long].collect().sorted.toSeq
    val nBase = docs.count()
    val bad = IndexRepair.minhashInconsistentIds(spark, dir)
      .as[Long].collect().sorted
    assert(bad.toSeq == tornIds, s"drop set was ${bad.toSeq}")
    val rep = reportMap(IndexRepair.repairMinhashIndex(spark, dir))
    assert(rep("dropped_ids_for_reappend") == tornIds.size.toLong)
    assert(rep("collapsed_duplicate_band_rows") == 0L)
    // the index is consistent but incomplete until the re-append
    assert(IndexFsck.checkMinhash(spark, dir).agg(sum("violations"))
      .collect().head.getLong(0) == 0L)
    assert(spark.read.parquet(s"$dir/sigs").count() == nBase)
    Dedup.appendMinhashIndex(torn, "doc_id", "text", dir)
    assert(spark.read.parquet(s"$dir/sigs").count() == nBase + tornIds.size)
    assert(IndexFsck.checkMinhash(spark, dir).agg(sum("violations"))
      .collect().head.getLong(0) == 0L)
  }

  test("ivfPqInconsistentIds flags ids whose every row is out-of-range (count-0 shape)") {
    val dir = scratch("rep_ivf")
    val vecs = graft.engine.Tables.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 200)
    Similarity.writeIvfPqResidualIndex(vecs, "vec_id", "embedding", dir)
    assert(IndexRepair.ivfPqInconsistentIds(spark, dir).isEmpty)
    // mixed-build plant: one id's full row set against a vanished cell
    val someId = spark.read.parquet(s"$dir/codes")
      .agg(min("__cid")).collect().head.getLong(0)
    spark.read.parquet(s"$dir/codes").filter(col("__cid") === someId)
      .withColumn("__cid", lit(900001L))
      .withColumn("cell", col("cell") - col("cell") + lit(424242))
      .write.mode("append").parquet(s"$dir/codes")
    val bad = IndexRepair.ivfPqInconsistentIds(spark, dir).as[Long].collect()
    assert(bad.toSeq == Seq(900001L), s"drop set was ${bad.toSeq}")
    val rep = reportMap(IndexRepair.repairIvfPqIndex(spark, dir))
    assert(rep("dropped_out_of_range_rows") > 0L)
    assert(rep("dropped_ids_for_reappend") == 1L)
    assert(IndexFsck.checkIvfPq(spark, dir).agg(sum("violations"))
      .collect().head.getLong(0) == 0L)
    // the healthy ids survived untouched
    assert(spark.read.parquet(s"$dir/codes").select("__cid").distinct().count()
      == vecs.count())
  }

  test("report actions PARTITION the removed rows: a duplicated ghost posting counts once, as ghost") {
    val dir = scratch("rep_bm25_ovl")
    Retrieval.writeBm25Index(docs, "doc_id", "text", dir, termShards = 4)
    // torn append (no doclens row) that was then crash-retried: the ghost
    // rows land TWICE — they must show up only under the ghost action, or
    // the report over-describes the repair by the overlap
    val ghost = graft.engine.Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id").between(120, 129))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val perAppend = ghost.count()
    ghost.write.mode("append").parquet(s"$dir/postings")
    ghost.write.mode("append").parquet(s"$dir/postings")
    val rep = reportMap(IndexRepair.repairBm25Index(spark, dir, termShards = 4))
    assert(rep("reclaimed_ghost_posting_rows") == 2 * perAppend)
    assert(rep("collapsed_duplicate_posting_rows") == 0L)
    assert(IndexFsck.checkBm25(spark, dir).agg(sum("violations"))
      .collect().head.getLong(0) == 0L)
  }

  test("repairClusterAssignment preserves singletons and never invents connectivity") {
    val stored = Seq(
      (5L, 9L),   // keeper above doc: must relabel to min 5
      (9L, 9L),
      (30L, 30L), // pure singleton: must round-trip
      (41L, 40L), (42L, 41L) // torn relabel chain: all -> 40
    ).toDF("doc_id", "keeper")
    val repaired = IndexRepair.repairClusterAssignment(stored)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(repaired == Seq((5L, 5L), (9L, 5L), (30L, 30L),
      (40L, 40L), (41L, 40L), (42L, 40L)))
    assert(IndexFsck.checkClusterAssignment(
      IndexRepair.repairClusterAssignment(stored))
      .agg(sum("violations")).collect().head.getLong(0) == 0L)
  }
}
