package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM-style subword tokenizer (the SentencePiece family, Kudo
  * 2018) — completes the tokenizer trio next to [[Bpe]] (merge ranks) and
  * [[WordPiece]] (greedy longest match). The reference tokenizes only for
  * its text functions (`tajo-core/src/main/java/org/apache/tajo/engine/
  * function/string/SplitPart.java:38`); subword tokenizers are pipeline
  * extensions.
  *
  * Where WordPiece commits greedily left-to-right, Unigram picks the
  * GLOBALLY best segmentation of each word by dynamic programming. To
  * stay integer-exact (bit-replayable in any SQL engine — no log-prob
  * floats), the likelihood is modeled lexicographically: minimize piece
  * count first (an MDL prior: every piece costs one "slot"), then
  * maximize the summed integer piece score (corpus occurrence mass ×
  * piece length — frequent long pieces stand in for high-probability
  * units), then prefer the leftmost-longest piece among still-optimal
  * choices. Each tie-break level is a pure integer comparison, so the DP
  * replays exactly in DuckDB via a backward recursion carrying the dp
  * arrays, which a forward walk then reconstructs.
  *
  * Scale: the vocab is bounded (distinct chars + `topPieces` rows) and
  * ships as a broadcast closure into a per-row projection; the DP is
  * O(word_len × maxLen) per row with no shuffle. The corpus is touched
  * twice (vocab aggregation + encode), and the collected vocab is the
  * only driver pull — the same bounded-pull class as Bpe's merge table.
  */
object Unigram {

  /** Deterministic integer-scored vocab: every single character (so
    * encoding is total — no UNK) plus the `topPieces` highest-scoring
    * substrings of length 2..maxLen. A piece's score is its corpus
    * occurrence mass times its length (each occurrence inside a word
    * counts that word's frequency), so "frequent and long" wins — the
    * integer stand-in for a trained unigram log-likelihood. Empty words
    * from repeated separators are dropped. */
  def vocab(docs: DataFrame, textCol: String,
            maxLen: Int = 3, topPieces: Int = 40): DataFrame = {
    require(maxLen >= 2, "maxLen must be >= 2")
    val words = WordPiece.wordFreqs(docs, textCol)
    val chars = words
      .select(col("freq"), explode(expr("FILTER(SPLIT(w, ''), c -> c <> '')")).as("p"))
      .groupBy("p").agg(sum(col("freq")).as("score"))
    val multi = words
      .select(col("freq"), explode(expr(
        s"""FLATTEN(TRANSFORM(SEQUENCE(2, $maxLen), k ->
           |  CASE WHEN LENGTH(w) >= k
           |       THEN TRANSFORM(SEQUENCE(1, LENGTH(w) - k + 1), i -> SUBSTR(w, i, k))
           |       ELSE ARRAY() END))""".stripMargin)).as("p"))
      .groupBy("p").agg(sum(col("freq") * length(col("p"))).as("score"))
      .orderBy(col("score").desc, col("p")).limit(topPieces)
    chars.unionAll(multi).select(col("p"), col("score").cast("long"))
  }

  /** One EM-style refinement round (the SentencePiece training shape,
    * integer-exact): segment the corpus with the current vocab (E-step),
    * re-score every piece by its ACTUAL usage count in the optimal
    * segmentations (M-step), drop multi-char pieces the DP never chose,
    * and keep every single char (score 0 if unused) so encoding stays
    * total. The returned vocab feeds [[encode]] for the refined
    * segmentation. Usage counts are bounded by the vocab size — the same
    * bounded driver pull as the vocab itself. */
  def refine(docs: DataFrame, idCol: String, textCol: String,
             vocabRows: Seq[(String, Long)]): Seq[(String, Long)] = {
    val usage = encode(docs, idCol, textCol, vocabRows)
      .select(explode(col("pieces")).as("p"))
      .groupBy("p").agg(count(lit(1)).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val chars = vocabRows.collect { case (p, _) if p.length == 1 =>
      (p, usage.getOrElse(p, 0L)) }
    val multi = vocabRows.collect { case (p, _) if p.length >= 2 && usage.contains(p) =>
      (p, usage(p)) }
    chars ++ multi
  }

  /** DuckDB replay of the DP + reconstruction against a vocab CTE
    * `$vocabCte` (columns p, s), over the `words` CTE (w, freq): emits
    * `dp$sfx`, `dpfinal$sfx`, `walk$sfx` — walk rows carry (w, piece). */
  def oracleDpCtes(vocabCte: String, sfx: String): String =
    s"""dp$sfx AS (
       |  SELECT w, length(w) + 1 AS pos,
       |    CAST([0] AS BIGINT[]) AS dpc, CAST([0] AS BIGINT[]) AS dps
       |  FROM words
       |  UNION ALL
       |  SELECT w, np, list_prepend(bc, dpc),
       |    list_prepend((SELECT MAX(v.s + st.dps[length(v.p)]) FROM $vocabCte v
       |       WHERE substr(st.w, st.np, length(v.p)) = v.p
       |         AND 1 + st.dpc[length(v.p)] = st.bc), dps)
       |  FROM (
       |    SELECT d.w, d.pos - 1 AS np, d.dpc, d.dps,
       |      (SELECT MIN(1 + d.dpc[length(v.p)]) FROM $vocabCte v
       |        WHERE substr(d.w, d.pos - 1, length(v.p)) = v.p) AS bc
       |    FROM dp$sfx d WHERE d.pos > 1
       |  ) st
       |), dpfinal$sfx AS (
       |  SELECT w, dpc, dps FROM dp$sfx WHERE pos = 1
       |), walk$sfx AS (
       |  SELECT w, 1 AS pos, CAST(NULL AS VARCHAR) AS piece, dpc, dps
       |  FROM dpfinal$sfx
       |  UNION ALL
       |  SELECT r.w, r.pos + length(ch.p), ch.p, r.dpc, r.dps
       |  FROM walk$sfx r, LATERAL (
       |    SELECT v.p FROM $vocabCte v
       |    WHERE substr(r.w, r.pos, length(v.p)) = v.p
       |      AND 1 + r.dpc[r.pos + length(v.p)] = r.dpc[r.pos]
       |      AND v.s + r.dps[r.pos + length(v.p)] = r.dps[r.pos]
       |    ORDER BY length(v.p) DESC, v.p LIMIT 1
       |  ) ch
       |  WHERE r.pos <= length(r.w)
       |)""".stripMargin

  /** Viterbi-style encode against a collected (piece, score) vocab;
    * returns (id, pieces, n_pieces). dp(i) over suffix positions holds
    * (min piece count, max score at that count); the forward walk takes
    * the longest piece consistent with dp — any such piece extends an
    * optimal segmentation, so the result is the leftmost-longest optimum.
    * Characters absent from the vocab (possible only when the vocab was
    * derived from a different corpus) fall back to implicit score-0
    * singletons so the encode stays total. The DP runs once per DISTINCT
    * word per task via [[WordMemo]]. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocabRows: Seq[(String, Long)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vmap = vocabRows.toMap
    val maxLen = vocabRows.iterator.map(_._1.length).foldLeft(1)(math.max)
    val enc = udf(new WordMemo(w => encodeWord(w, vmap, maxLen)))
    docs.select(col(idCol), enc(col(textCol)).as("pieces"))
      .withColumn("n_pieces", size($"pieces").cast("bigint"))
  }

  /** Absent multi-char pieces score Long.MinValue (impossible for real
    * scores, which are non-negative counts); absent single chars fall back
    * to the implicit score-0 singleton. */
  private def pieceScore(vmap: Map[String, Long], p: String): Long =
    vmap.getOrElse(p, if (p.length == 1) 0L else Long.MinValue)

  private def encodeWord(w: String, vmap: Map[String, Long],
                         maxLen: Int): Seq[String] = {
    val n = w.length
    val dpc = new Array[Long](n + 1)
    val dps = new Array[Long](n + 1)
    var i = n - 1
    while (i >= 0) {
      var bc = Long.MaxValue
      var bs = Long.MinValue
      var k = 1
      val kMax = math.min(maxLen, n - i)
      while (k <= kMax) {
        val s = pieceScore(vmap, w.substring(i, i + k))
        if (s != Long.MinValue) {
          val c = 1L + dpc(i + k)
          val sc = s + dps(i + k)
          if (c < bc || (c == bc && sc > bs)) { bc = c; bs = sc }
        }
        k += 1
      }
      dpc(i) = bc
      dps(i) = bs
      i -= 1
    }
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < n) {
      var k = math.min(maxLen, n - pos)
      var taken = false
      while (!taken) {
        val p = w.substring(pos, pos + k)
        val s = pieceScore(vmap, p)
        val ok = s != Long.MinValue &&
          1L + dpc(pos + k) == dpc(pos) && s + dps(pos + k) == dps(pos)
        if (ok) { out += p; pos += k; taken = true } else k -= 1
      }
    }
    out.result()
  }
}
