package graft.tools

import org.apache.spark.sql.functions._

/** Scratch per-trigger profiler for the streaming family (VERDICT r13 #4):
  * times the q_stream_bm25_indexed shape end-to-end, then re-times ONE
  * micro-batch body (StreamingRetrieval.indexedBm25Batch) component by
  * component in the same JVM, so the per-trigger fixed cost (engine
  * bookkeeping vs fold vs rescore) is visible before anything is changed.
  * Usage: runMain graft.tools.StreamProbe [sfDir] */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local(32, "stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.register(spark, sfDir)
    graft.engine.Tables.all.foreach(t => spark.table(t).limit(1).count())
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val s = String.valueOf(r).take(32)
      println(f"[sprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($s)")
    }
    val docs = graft.engine.Tables.table(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") < 250).select("doc_id", "text")
    val batch1 = docs.filter(col("doc_id").between(300, 349))
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val batch2 = docs.filter(col("doc_id").between(350, 379))
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    val base = s"/tmp/graft_stream_probe/${java.util.UUID.randomUUID().toString.take(8)}"

    // ---- the full query shape, phase by phase
    var qterms: Seq[String] = null
    t("corpus-index-build") {
      val idx = graft.operators.Retrieval.writeBm25Index(
        corpus, "doc_id", "text", s"$base/idx")
      qterms = idx.postings.groupBy("term")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(3)
        .select("term").collect().map(_.getString(0)).toSeq
    }
    t("stage-batches") {
      batch1.write.parquet(s"$base/in/b1")
      Thread.sleep(1100) // mtime order
      batch2.write.parquet(s"$base/in/b2")
      val f1 = new java.io.File(s"$base/in/b1")
      val f2 = new java.io.File(s"$base/in/b2")
      (f1.listFiles().length, f2.listFiles().length)
    }
    t("stream-2-triggers") {
      val stream = spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$base/in/*")
      val q = graft.streaming.StreamingRetrieval.indexedBm25Stream(
        stream, s"$base/idx", s"$base/scores", qterms)
      q.processAllAvailable()
      q.stop()
    }
    t("sink-read")(spark.read.parquet(s"$base/scores").count())

    // ---- one batch body, component by component (fresh dirs, same JVM)
    val base2 = s"/tmp/graft_stream_probe/${java.util.UUID.randomUUID().toString.take(8)}"
    t("b2-index-build")(graft.operators.Retrieval.writeBm25Index(
      corpus, "doc_id", "text", s"$base2/idx"))
    t("b2-batch-body-1")(graft.streaming.StreamingRetrieval.indexedBm25Batch(
      batch1, s"$base2/idx", s"$base2/scores", qterms))
    t("b2-batch-body-2")(graft.streaming.StreamingRetrieval.indexedBm25Batch(
      batch2, s"$base2/idx", s"$base2/scores", qterms))
    // components of a third fold
    val batch3 = docs.filter(col("doc_id").between(380, 399))
      .select((col("doc_id") + 300000L).as("doc_id"), col("text"))
    t("b2-checkpoint") {
      val b = batch3.select(col("doc_id"), col("text")).localCheckpoint()
      graft.operators.Checkpoints.free(b); ()
    }
    t("b2-append")(graft.operators.Retrieval.appendBm25Index(
      batch3, "doc_id", "text", s"$base2/idx", heal = true))
    val idx3 = graft.operators.Retrieval.Bm25Index.read(spark, s"$base2/idx")
    t("b2-doclens-count")(idx3.doclens.count())
    t("b2-score-write") {
      import spark.implicits._
      graft.operators.Retrieval.queryBm25Index(idx3, qterms.toDF("term"))
        .withColumn("n_docs_at", lit(0L))
        .select(col("n_docs_at"), col("doc_id"), col("score_ppm"))
        .write.mode("append").parquet(s"$base2/scores")
    }
    spark.stop()
  }
}
