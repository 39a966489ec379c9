package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece-style greedy longest-match-first tokenizer — the BERT-family
  * encoder, complementing [[Bpe]]'s merge-rank family (reference scope:
  * Tajo tokenizes only for its text functions, e.g. `tajo-core/src/main/
  * java/org/apache/tajo/engine/function/string/SplitPart.java:38`; subword
  * tokenizers are pipeline extensions).
  *
  * The ENCODER is the deterministic core: at each position take the
  * LONGEST vocab piece that matches (initial pieces at word start,
  * continuation pieces — rendered `##piece` — elsewhere), advance, repeat.
  * At one position only one string of each length can match, so greedy
  * longest-match has no ties and replays exactly; the vocab here derives
  * deterministically from corpus frequencies (all single characters for
  * guaranteed coverage — no UNK — plus top full words, top 2-char
  * prefixes, top 2-char continuations), standing in for a trained
  * likelihood vocab without floats.
  *
  * Scale: the vocab is bounded (≤ chars + 3·top rows) and broadcast into
  * a per-row encode; the corpus is touched twice (vocab derivation aggs +
  * the encode projection), and nothing data-sized reaches the driver —
  * the collected vocab is the only driver pull, the same bounded-pull
  * class as Bpe's merge table. */
object WordPiece {

  /** Shared tokenizer-vocab base: (word, freq) over space-split tokens,
    * empty words from repeated/leading separators dropped (a zero-length
    * piece can never match — it would only burn a vocab slot). One place
    * holds that invariant for every tokenizer family ([[WordPiece]],
    * [[Unigram]]) and their oracles. */
  private[operators] def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Deterministic demo vocab: (bare piece, isInitial). */
  def vocab(docs: DataFrame, textCol: String,
            topWords: Int = 30, topPrefix: Int = 30, topCont: Int = 30): DataFrame = {
    val words = wordFreqs(docs, textCol)
    val chars = words
      .select(explode(expr("FILTER(SPLIT(w, ''), c -> c <> '')")).as("p"))
      .distinct()
    val topw = words.orderBy(col("freq").desc, col("w")).limit(topWords)
      .select(col("w").as("p"))
    val pref2 = words.filter(length(col("w")) >= 2)
      .groupBy(expr("substr(w, 1, 2)").as("p")).agg(sum(col("freq")).as("s"))
      .orderBy(col("s").desc, col("p")).limit(topPrefix).select("p")
    val cont2 = words.filter(length(col("w")) >= 3)
      .select(col("freq"), explode(expr(
        "TRANSFORM(SEQUENCE(2, LENGTH(w) - 1), i -> SUBSTR(w, i, 2))")).as("p"))
      .groupBy("p").agg(sum(col("freq")).as("s"))
      .orderBy(col("s").desc, col("p")).limit(topCont).select("p")
    chars.unionAll(topw).unionAll(pref2).distinct()
      .select(col("p"), lit(true).as("initial"))
      .unionAll(chars.unionAll(cont2).distinct()
        .select(col("p"), lit(false).as("initial")))
  }

  /** Greedy encode against a collected vocab; returns (id, pieces, n_pieces)
    * with continuation pieces rendered `##`-prefixed. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocabRows: Seq[(String, Boolean)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val initial = vocabRows.collect { case (p, true) => p }.toSet
    val cont = vocabRows.collect { case (p, false) => p }.toSet
    val maxLen = (initial.iterator ++ cont.iterator).map(_.length).foldLeft(1)(math.max)
    // Greedy scan runs once per DISTINCT word per task via WordMemo.
    val enc = udf(new WordMemo(w => {
      val out = Seq.newBuilder[String]
      var pos = 0
      while (pos < w.length) {
        val set = if (pos == 0) initial else cont
        var l = math.min(maxLen, w.length - pos)
        while (l > 1 && !set.contains(w.substring(pos, pos + l))) l -= 1
        val piece = w.substring(pos, pos + l)
        // Fallback contract: when the vocab was trained on THIS corpus,
        // every single char is in vocab, so the l=1 piece always matches.
        // With a CROSS-CORPUS vocab, an unseen character is still emitted
        // as its own (out-of-vocab) piece rather than dropped or turned
        // into an [UNK] sentinel — encoding stays total and lossless, the
        // same explicit pass-through contract as Unigram.encode's
        // single-char fallback.
        out += (if (pos == 0) piece else "##" + piece)
        pos += l
      }
      out.result()
    }))
    docs.select(col(idCol), enc(col(textCol)).as("pieces"))
      .withColumn("n_pieces", size($"pieces").cast("bigint"))
  }
}
