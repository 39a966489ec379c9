package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, TextAnalysis}

/** The persisted BM25 index lifecycle (Retrieval): query == bm25Lite
  * bit-identity, append idempotence + append == rebuild, tokenizer-tag
  * validation, compaction (drops + retried-duplicate collapse), and
  * interrupted-swap crash recovery at read. */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs = graft.engine.Tables
    .table(spark, sfDir, "documents")
    .filter(col("doc_id") < 200).select("doc_id", "text")

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def topTerms(idx: Retrieval.Bm25Index, n: Int = 3) =
    idx.postings.groupBy("term").agg(sum($"tf").as("n"))
      .orderBy($"n".desc, $"term").limit(n).select("term")

  private def scores(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.orderBy($"score_ppm".desc, $"doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_ppm"))).toSeq

  test("index query is bit-identical to bm25Lite over the same corpus") {
    val dir = scratch("bm25_idx")
    val idx = Retrieval.writeBm25Index(docs, "doc_id", "text", dir, termShards = 4)
    val qterms = topTerms(idx)
    val viaIndex = scores(Retrieval.queryBm25Index(idx, qterms))
    val viaText = scores(TextAnalysis.bm25Lite(docs, "doc_id", "text", qterms))
    assert(viaIndex.nonEmpty && viaIndex == viaText)
    // and the stored layout carries the meta tag
    assert(idx.meta.contains(Retrieval.Bm25Meta(Retrieval.TokenizerWs1)))
  }

  test("append: committed replay is a no-op and appended == rebuilt") {
    val dir = scratch("bm25_app")
    val corpus = docs.filter($"doc_id" < 150)
    val batch = docs.filter($"doc_id" >= 150)
      .select(($"doc_id" + 5000L).as("doc_id"), $"text")
    Retrieval.writeBm25Index(corpus, "doc_id", "text", dir, termShards = 4)
    val once = Retrieval.appendBm25Index(batch, "doc_id", "text", dir)
    val nPost = once.postings.count()
    val nLens = once.doclens.count()
    val twice = Retrieval.appendBm25Index(batch, "doc_id", "text", dir)
    assert(twice.postings.count() == nPost, "replayed append grew postings")
    assert(twice.doclens.count() == nLens, "replayed append grew doclens")
    // appended index answers exactly like one built over corpus UNION batch
    val rebuilt = Retrieval.writeBm25Index(corpus.unionAll(batch),
      "doc_id", "text", scratch("bm25_reb"), termShards = 4)
    val qterms = topTerms(twice)
    assert(scores(Retrieval.queryBm25Index(twice, qterms)) ==
      scores(Retrieval.queryBm25Index(rebuilt, qterms)))
  }

  test("tokenizer tag mismatch fails loudly on query and append") {
    val dir = scratch("bm25_meta")
    Retrieval.writeBm25Index(docs, "doc_id", "text", dir, termShards = 2)
    // simulate an index stamped by a future tokenizer version
    Retrieval.Bm25Meta.write(spark, dir, Retrieval.Bm25Meta("bpe-v2"))
    val tampered = Retrieval.Bm25Index.read(spark, dir)
    val eq = intercept[IllegalArgumentException] {
      Retrieval.queryBm25Index(tampered, Seq("the").toDF("term"))
    }
    assert(eq.getMessage.contains("bpe-v2") && eq.getMessage.contains("ws1"))
    val ea = intercept[IllegalArgumentException] {
      Retrieval.appendBm25Index(docs.limit(1), "doc_id", "text", dir)
    }
    assert(ea.getMessage.contains("tokenizer mismatch"))
  }

  test("compact drops tombstoned docs and collapses retried-append duplicates") {
    val dir = scratch("bm25_cmp")
    val corpus = docs.filter($"doc_id" < 150)
    val batch = docs.filter($"doc_id" >= 150)
      .select(($"doc_id" + 5000L).as("doc_id"), $"text")
    Retrieval.writeBm25Index(corpus, "doc_id", "text", dir, termShards = 4)
    Retrieval.appendBm25Index(batch, "doc_id", "text", dir)
    // torn crash-retry state: batch postings land twice, doclens once
    batch.select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
      .write.mode("append").parquet(s"$dir/postings")
    val drops = corpus.filter($"doc_id" % 10 === 3).select("doc_id")
    val compacted = Retrieval.compactBm25Index(spark, dir,
      dropIds = Some(drops), termShards = 4)
    // dropped ids gone from both tables; no (term, id) duplicates remain
    assert(compacted.doclens.join(drops, Seq("doc_id")).count() == 0)
    assert(compacted.postings.join(drops, Seq("doc_id")).count() == 0)
    assert(compacted.postings.groupBy("term", "doc_id").count()
      .filter($"count" > 1).count() == 0)
    // and the compacted index equals a rebuild over the surviving corpus
    val survivors = corpus.filter($"doc_id" % 10 =!= 3).unionAll(batch)
    val rebuilt = Retrieval.writeBm25Index(survivors, "doc_id", "text",
      scratch("bm25_cmp_reb"), termShards = 4)
    val qterms = topTerms(compacted)
    assert(scores(Retrieval.queryBm25Index(compacted, qterms)) ==
      scores(Retrieval.queryBm25Index(rebuilt, qterms)))
    // meta tag survives the swap
    assert(compacted.meta.contains(Retrieval.Bm25Meta(Retrieval.TokenizerWs1)))
  }

  test("liveness rule: a torn append (postings without doclens) is invisible to queries") {
    val dir = scratch("bm25_ghost")
    val corpus = docs.filter($"doc_id" < 150)
    val batch = docs.filter($"doc_id" >= 150)
      .select(($"doc_id" + 5000L).as("doc_id"), $"text")
    val built = Retrieval.writeBm25Index(corpus, "doc_id", "text", dir, termShards = 4)
    // materialized to literals: a lazy qterms plan would capture the
    // pre-compaction postings file listing and fail after the swap below
    val qterms = topTerms(built).collect().map(_.getString(0)).toSeq.toDF("term")
    val before = scores(Retrieval.queryBm25Index(built, qterms))
    assert(before.nonEmpty)
    // torn state: postings committed, doclens not (crash between the writes)
    batch.select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
      .write.mode("append").parquet(s"$dir/postings")
    val torn = Retrieval.Bm25Index.read(spark, dir)
    // ghost rows must not move ANY statistic — df included — so the torn
    // index scores bit-identically to the pre-append index
    assert(scores(Retrieval.queryBm25Index(torn, qterms)) == before)
    // and compaction's liveness sweep reclaims the ghosts
    val compacted = Retrieval.compactBm25Index(spark, dir, termShards = 4)
    assert(compacted.postings.filter($"doc_id" >= 5000L).count() == 0)
    assert(scores(Retrieval.queryBm25Index(compacted, qterms)) == before)
  }

  test("compact swap order: the between-swaps crash state scores like the compacted index") {
    val dir = scratch("bm25_midcmp")
    Retrieval.writeBm25Index(docs, "doc_id", "text", dir, termShards = 4)
    val drops = docs.filter($"doc_id" % 7 === 2).select("doc_id")
    // the fully-compacted answer, from an identical sibling index
    val sib = scratch("bm25_midcmp_sib")
    Retrieval.writeBm25Index(docs, "doc_id", "text", sib, termShards = 4)
    val full = Retrieval.compactBm25Index(spark, sib, dropIds = Some(drops),
      termShards = 4)
    val qterms = topTerms(full)
    val want = scores(Retrieval.queryBm25Index(full, qterms))
    assert(want.nonEmpty)
    // simulate the crash window: doclens swapped (tombstones gone), the
    // postings swap never ran — exactly compactBm25Index's first half
    spark.read.parquet(s"$dir/doclens")
      .join(drops, Seq("doc_id"), "left_anti")
      .write.parquet(s"$dir/_doclens_new")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/doclens"))
    assert(new java.io.File(s"$dir/_doclens_new")
      .renameTo(new java.io.File(s"$dir/doclens")))
    spark.catalog.refreshByPath(s"$dir/doclens")
    val mid = Retrieval.Bm25Index.read(spark, dir)
    assert(mid.postings.join(drops, Seq("doc_id")).count() > 0,
      "fixture must leave tombstoned postings in place")
    assert(scores(Retrieval.queryBm25Index(mid, qterms)) == want)
  }

  test("indexed stream loop: replay appends nothing and re-emits the same scores") {
    val base = scratch("bm25_loop")
    val corpus = docs.filter($"doc_id" < 150)
    val batch = docs.filter($"doc_id" >= 150)
      .select(($"doc_id" + 5000L).as("doc_id"), $"text")
    val built = Retrieval.writeBm25Index(corpus, "doc_id", "text", s"$base/idx",
      termShards = 4)
    val qterms = topTerms(built, 2).collect().map(_.getString(0)).toSeq
    graft.streaming.StreamingRetrieval.indexedBm25Batch(
      batch, s"$base/idx", s"$base/scores", qterms)
    val after1 = Retrieval.Bm25Index.read(spark, s"$base/idx")
    val nPost = after1.postings.count()
    val rows1 = spark.read.parquet(s"$base/scores")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows1.nonEmpty)
    // at-least-once replay of the committed trigger
    graft.streaming.StreamingRetrieval.indexedBm25Batch(
      batch, s"$base/idx", s"$base/scores", qterms)
    val after2 = Retrieval.Bm25Index.read(spark, s"$base/idx")
    assert(after2.postings.count() == nPost, "replayed trigger grew the index")
    val rows2 = spark.read.parquet(s"$base/scores")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // exactly the original rows, twice — dedupe on (n_docs_at, doc_id)
    // restores the clean sink
    assert(rows2 == (rows1 ++ rows1).sortBy(_.toString))
    // scores tag the POST-fold index version
    assert(rows1.forall(_.head == after1.doclens.count()))
  }

  test("heal-mode append closes the torn postings-without-doclens window") {
    val dir = scratch("bm25_heal")
    val corpus = docs.filter($"doc_id" < 150)
    val batch = docs.filter($"doc_id" >= 150)
      .select(($"doc_id" + 5000L).as("doc_id"), $"text")
    Retrieval.writeBm25Index(corpus, "doc_id", "text", dir, termShards = 4)
    // torn state: a crashed append committed postings but not doclens
    batch.select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
      .write.mode("append").parquet(s"$dir/postings")
    // the healed retry must land doclens WITHOUT duplicating postings
    val healed = Retrieval.appendBm25Index(batch, "doc_id", "text", dir,
      heal = true)
    assert(healed.postings.groupBy("term", "doc_id").count()
      .filter($"count" > 1).count() == 0, "heal left duplicate postings")
    assert(healed.doclens.join(batch.select("doc_id"), Seq("doc_id")).count()
      == batch.count(), "heal did not commit the batch's doclens")
    // and the healed index scores exactly like a clean rebuild
    val rebuilt = Retrieval.writeBm25Index(corpus.unionAll(batch),
      "doc_id", "text", scratch("bm25_heal_reb"), termShards = 4)
    val qterms = topTerms(healed)
    assert(scores(Retrieval.queryBm25Index(healed, qterms)) ==
      scores(Retrieval.queryBm25Index(rebuilt, qterms)))
  }

  test("read recovers an interrupted compaction swap") {
    val dir = scratch("bm25_torn")
    val built = Retrieval.writeBm25Index(docs, "doc_id", "text", dir, termShards = 2)
    val qterms = topTerms(built, 1).collect().map(_.getString(0)).toSeq
    val before = scores(Retrieval.queryBm25Index(
      Retrieval.Bm25Index.read(spark, dir), qterms.toDF("term")))
    assert(before.nonEmpty)
    // crash window: rename(live, old) succeeded, rename(stage, live) did not
    val fs = new java.io.File(s"$dir/postings")
    assert(fs.renameTo(new java.io.File(s"$dir/_postings_old")))
    val recovered = Retrieval.Bm25Index.read(spark, dir)
    assert(scores(Retrieval.queryBm25Index(
      recovered, qterms.toDF("term"))) == before)
    assert(new java.io.File(s"$dir/postings").exists())
  }

  test("torn rebuild marker: a crashed writeBm25Index refuses every read until re-run") {
    val dir = scratch("bm25_reb_torn")
    Retrieval.writeBm25Index(docs, "doc_id", "text", dir, termShards = 2)
    // the crash window: a rebuild-in-place died between the postings and
    // doclens overwrites — both tables exist and parse, only the surviving
    // intent marker distinguishes the mixed-build state
    new java.io.File(s"$dir/_rebuild_intent").createNewFile()
    val e = intercept[IllegalArgumentException](Retrieval.Bm25Index.read(spark, dir))
    assert(e.getMessage.contains("torn writeBm25Index"))
    intercept[IllegalArgumentException](
      Retrieval.appendBm25Index(docs.limit(1), "doc_id", "text", dir))
    intercept[IllegalArgumentException](
      Retrieval.compactBm25Index(spark, dir, termShards = 2))
    // the documented remedy — re-run the rebuild — clears the marker
    val idx = Retrieval.writeBm25Index(docs, "doc_id", "text", dir, termShards = 2)
    assert(!new java.io.File(s"$dir/_rebuild_intent").exists())
    assert(scores(Retrieval.queryBm25Index(idx, topTerms(idx))).nonEmpty)
  }

  test("interrupted compaction blocks appends (ghost revival) until re-run; queries keep working") {
    val dir = scratch("bm25_cint")
    val corpus = docs.filter($"doc_id" < 150)
    val built = Retrieval.writeBm25Index(corpus, "doc_id", "text", dir, termShards = 2)
    val qterms = topTerms(built)
    // the crash window between the doclens and postings swaps: doclens
    // compacted, ghost postings still present, intent marker surviving
    new java.io.File(s"$dir/_compact_intent").createNewFile()
    // queries stay correct throughout (ghost invisibility — spec'd above)
    assert(scores(Retrieval.queryBm25Index(
      Retrieval.Bm25Index.read(spark, dir), qterms)).nonEmpty)
    // but an append could revive a dropped id's ghosts — refused loudly
    val batch = docs.filter($"doc_id" >= 150)
    val e = intercept[IllegalArgumentException](
      Retrieval.appendBm25Index(batch, "doc_id", "text", dir))
    assert(e.getMessage.contains("interrupted compactBm25Index"))
    // finishing the compaction (no dropIds needed) clears the marker and
    // the append proceeds
    Retrieval.compactBm25Index(spark, dir, termShards = 2)
    assert(!new java.io.File(s"$dir/_compact_intent").exists())
    val appended = Retrieval.appendBm25Index(batch, "doc_id", "text", dir)
    assert(appended.doclens.count() == corpus.count() + batch.count())
  }
}
