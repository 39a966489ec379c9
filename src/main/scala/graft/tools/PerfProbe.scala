package graft.tools

import org.apache.spark.sql.functions._

/** Scratch stage-by-stage timer for the minhash pair pipeline (keeps the
  * optimizer honest with a hash-sum over every stage's real columns so
  * nothing prunes away). Usage: tools/run_main.sh graft.tools.PerfProbe [sfDir]. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("tools/sf1")
    val spark = graft.engine.GraftSession.local(32, "perf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.register(spark, sfDir)
    import graft.operators.Dedup
    val docs = spark.table("documents")
    docs.count()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val sigs = Dedup.minhashSignature(docs, "doc_id", "text")
    t("sig-forced")(sigs.agg(expr("bit_xor(xxhash64(sig))")).head().getLong(0))
    val bands = Dedup.minhashBands(sigs, "doc_id")
    t("bands-forced")(bands.agg(expr("bit_xor(xxhash64(band_key))")).head().getLong(0))
    val buckets = bands.groupBy("band", "band_key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    t("buckets-forced")(buckets.agg(sum(size(col("ids")))).head().get(0))
    t("pairs-full")(Dedup.minhashCandidates(bands, "doc_id").count())
    t("pairs-full-again")(Dedup.minhashCandidates(bands, "doc_id").count())
    spark.stop()
  }
}
