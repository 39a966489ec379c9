package graft.tools

import org.apache.spark.sql.functions._

/** Scratch bucket-statistics probe for the wide simhash banding
  * ([[graft.operators.Dedup.simhashNearDupsWide]]): where do the in-bucket
  * candidate pairs come from at a given sf — identical signatures (exact
  * near-dup groups) or merely-colliding slices? Drives the hot-bucket
  * remediation choice. Usage: tools/run_main.sh graft.tools.SimhashProbe [sfDir].
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("tools/sf1")
    val spark = graft.engine.GraftSession.local(32, "simhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.register(spark, sfDir)
    graft.functions.TajoFunctions.register(spark)
    val docs = spark.table("documents")
    val n = docs.count()
    val sh = docs.select(col("doc_id"),
      expr("simhash60(SPLIT(text, ' '))").as("simhash")).cache()
    val nSig = sh.select("simhash").distinct().count()
    println(s"[probe] docs=$n distinctSigs=$nSig dupSigDocs=${n - nSig}")
    // identical-signature group sizes
    val g = sh.groupBy("simhash").count().filter(col("count") > 1)
      .agg(count(lit(1)), sum(col("count")),
        sum(col("count") * (col("count") - 1) / 2), max("count")).head()
    println(s"[probe] dupSigGroups=${g.get(0)} docsInDupGroups=${g.get(1)} intraGroupPairs=${g.get(2)} maxGroup=${g.get(3)}")
    // banded bucket stats (4 x 15-bit)
    val width = 15; val mask = (1L << width) - 1
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(expr(s"TRANSFORM(SEQUENCE(0, 3), " +
        s"b -> STRUCT(b AS band, SHIFTRIGHT(simhash, b * $width) & $mask AS slice))")).as("bs"))
      .select(col("doc_id"), col("simhash"), col("bs.band"), col("bs.slice"))
    val bk = banded.groupBy("band", "slice").count()
    val stats = bk.agg(count(lit(1)), max("count"),
      sum(col("count") * (col("count") - 1) / 2)).head()
    println(s"[probe] buckets=${stats.get(0)} maxBucket=${stats.get(1)} candPairs=${stats.get(2)}")
    // same stats over DISTINCT signatures (what a sig-collapse would join)
    val bandedD = sh.select(col("simhash")).distinct()
      .select(col("simhash"), explode(expr(s"TRANSFORM(SEQUENCE(0, 3), " +
        s"b -> STRUCT(b AS band, SHIFTRIGHT(simhash, b * $width) & $mask AS slice))")).as("bs"))
      .select(col("simhash"), col("bs.band"), col("bs.slice"))
    val bkD = bandedD.groupBy("band", "slice").count()
    val statsD = bkD.agg(count(lit(1)), max("count"),
      sum(col("count") * (col("count") - 1) / 2)).head()
    println(s"[probe] DISTINCT-sig buckets=${statsD.get(0)} maxBucket=${statsD.get(1)} candPairs=${statsD.get(2)}")
    // two-level refined keys — the SHARED builder, so these statistics
    // always describe the key layout simhashNearDupsWide actually ships
    val keys = graft.operators.Dedup.simhash60PackedKeys(maxHamming = 3, bands = 4)
    val refined = sh.select(explode(expr(keys)).as("bkey")).groupBy("bkey").count()
    val refStats = refined.filter(col("count") > 1)
      .agg(count(lit(1)), max("count"),
        sum(col("count") * (col("count") - 1) / 2)).head()
    println(s"[probe] refined buckets=${refStats.get(0)} maxBucket=${refStats.get(1)} candPairs=${refStats.get(2)}")
    // output size (the floor any exact pair listing pays)
    val pairs = graft.operators.Dedup
      .simhashNearDupsWide(docs, "doc_id", "text").count()
    println(s"[probe] outputPairs=$pairs")
    spark.stop()
  }
}
