package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer: train merge rules over a
  * corpus, then encode text with them — the trainable version of the
  * BPE-ish regex in [[TextAnalysis.tokenCounts]].
  *
  * Training never materializes the corpus on the driver: the working set
  * is the DISTINCT-WORD frequency table (vocabulary-sized — Heaps' law —
  * not corpus-sized), pair counting is a partial+final aggregation per
  * round, and the only thing that crosses to the driver is one (pair,
  * count) scalar per merge — the same control-flow-only pattern as
  * [[Dedup.duplicateClusters]]. localCheckpoint truncates the per-round
  * lineage. Encoding is a per-row map with the (small) merge table
  * captured in the closure.
  *
  * Determinism: the winning pair each round is argmax by (count DESC,
  * pair ASC) — total order, so the same corpus always learns the same
  * merges on any cluster layout.
  */
object Bpe {

  /** End-of-word marker (keeps merges from crossing word boundaries). */
  val EndOfWord = "</w>"

  /** Learned merge rules in training order. */
  final case class Merge(rank: Int, a: String, b: String)

  private def mergeOnce(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Learn `numMerges` merge rules from the corpus.
    *
    * `batch` > 1 applies up to that many NON-INTERFERING pairs per
    * counting round, cutting the number of Spark jobs (a real ~30k-merge
    * vocab at batch=1 is ~30k sequential jobs — the wall-clock bound, not
    * a data-scale one, since the working set stays vocab-sized). Two
    * ranked pairs interfere iff one's right symbol is the other's left
    * symbol (their occurrences can overlap, so applying one changes the
    * other's count); pairs that merely share a left or share a right
    * symbol cannot overlap and keep exact counts. Batched ranks follow
    * the round's count ranking, which equals sequential training whenever
    * each round's winners are disjoint (OperatorsSpec pins this);
    * otherwise a pair formed by an earlier merge in the same round can't
    * win until the next round — the standard batched-BPE approximation.
    * batch=1 is bit-identical to classic sequential BPE.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            batch: Int = 1): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mergeBatch = udf((syms: Seq[String], as: Seq[String], bs: Seq[String]) => {
      var s = syms.toArray
      var i = 0
      while (i < as.length) { s = mergeOnce(s, as(i), bs(i)); i += 1 }
      s.toSeq
    })
    // distinct words with frequencies, as symbol sequences chars + </w>
    var words = docs
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy("w").agg(count("*").as("freq"))
      .select(expr(s"CONCAT(FILTER(SPLIT(w, ''), c -> c <> ''), ARRAY('$EndOfWord'))").as("syms"),
        col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 0
    var round = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val want = math.min(batch, numMerges - rank)
      val top = words
        .filter(size($"syms") >= 2)
        .select(col("freq"), explode(expr(
          """TRANSFORM(SEQUENCE(0, SIZE(syms) - 2),
            |  i -> STRUCT(ELEMENT_AT(syms, i + 1) AS a, ELEMENT_AT(syms, i + 2) AS b))""".stripMargin))
          .as("p"))
        .groupBy($"p.a", $"p.b").agg(sum("freq").as("cnt"))
        .orderBy($"cnt".desc, $"a", $"b")
        .limit(math.max(want * 4, 8)).collect()
      if (top.isEmpty) exhausted = true
      else {
        // greedy down the ranking: keep a pair unless it can overlap a
        // kept one (right-of-one == left-of-other); the top-1 pair is
        // always kept, so batch=1 reduces to classic sequential BPE
        val kept = scala.collection.mutable.ArrayBuffer[(String, String)]()
        val it = top.iterator
        while (kept.size < want && it.hasNext) {
          val r = it.next()
          val (a, b) = (r.getString(0), r.getString(1))
          if (kept.forall { case (ka, kb) => kb != a && b != ka && !(ka == a && kb == b) })
            kept += ((a, b))
        }
        kept.foreach { case (a, b) => merges += Merge(rank, a, b); rank += 1 }
        words = words.withColumn("syms", mergeBatch($"syms",
          typedLit(kept.map(_._1).toSeq), typedLit(kept.map(_._2).toSeq)))
        // checkpoint every few rounds, not every round: each checkpoint is
        // an extra job, and a lineage of a handful of chained merge UDFs
        // over the vocab-sized table is cheaper than materializing it
        round += 1
        if (round % 4 == 0) {
          val next = words.localCheckpoint()
          Checkpoints.free(words) // superseded vocab round
          words = next
        }
      }
    }
    Checkpoints.free(words) // merges (driver data) are the only output
    merges.toSeq
  }

  /** Tokenize with learned merges: (id, tokens ARRAY<STRING>, n_tokens). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.rank).map(m => (m.a, m.b)).toArray
    // The full merge-list replay runs once per DISTINCT word per task via
    // WordMemo (memo key is the raw word; lowercasing inside keeps the
    // pre-memo text.toLowerCase semantics — splitting on ' ' first is
    // equivalent because the space IS the case-mapping context boundary).
    val enc = udf(new WordMemo({ raw =>
      val w = raw.toLowerCase
      var syms = w.split("").filter(_.nonEmpty) :+ EndOfWord
      ordered.foreach { case (a, b) => syms = mergeOnce(syms, a, b) }
      syms.toSeq
    }))
    docs.select(col(idCol), enc(col(textCol)).as("tokens"))
      .withColumn("n_tokens", size($"tokens").cast("bigint"))
  }
}
