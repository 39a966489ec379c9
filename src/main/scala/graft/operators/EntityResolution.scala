package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution by blocked fuzzy matching — the classic block → score
  * → best-match pipeline (record linkage across two systems). Reference
  * scope: Tajo's string surface stops at exact/LIKE/regexp matching
  * (`tajo-core/src/main/java/org/apache/tajo/engine/function/string/
  * Substr.java:36`); fuzzy linkage is a pipeline extension like
  * Dedup/TextAnalysis.
  *
  * Never all-pairs: candidates come from an EQUI-join on a cheap blocking
  * key (lowercased name prefix + a doc-length bucket), scored by
  * Levenshtein distance inside the block only. The left side fans out to
  * the two length buckets its ±maxDist window can reach, which makes
  * length-boundary recall EXACT provided 2·maxDist ≤ lenBucket (enforced);
  * a typo inside the first `prefix` characters still escapes its block —
  * the standard blocking trade, documented here rather than hidden.
  *
  * Determinism: best match per left record = min (distance, right id);
  * both engines' levenshtein agree on ASCII (DuckDB's is byte-based,
  * Spark's codepoint-based — identical on single-byte text, which is the
  * fixture domain; documented).
  *
  * Scale: blocking keys are equi-join keys, so Spark shuffles both sides
  * on the key (or broadcasts the smaller system); per-block work is
  * |block|² scored pairs — the knob is block granularity (`prefix`,
  * `lenBucket`), and the hot-block failure mode is exactly what
  * [[Skew.diagnoseKey]] probes for. The final best-match is one
  * partitioned window (WindowGroupLimit). */
object EntityResolution {

  def resolve(left: DataFrame, right: DataFrame, idL: String, idR: String,
              nameL: String, nameR: String, maxDist: Int = 2, prefix: Int = 4,
              lenBucket: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxDist >= 0 && prefix >= 1 && lenBucket >= 2 * maxDist,
      s"need lenBucket >= 2*maxDist for exact boundary recall, got $lenBucket < ${2 * maxDist}")
    def blk(name: String, bucket: String) =
      concat(lower(substring(col(name), 1, prefix)), lit("|"), expr(bucket))
    // GREATEST clamp: for names shorter than maxDist the raw dividend goes
    // negative, where Spark's DIV truncates toward zero but DuckDB's //
    // floors (0 vs -1) — clamping to 0 keeps both engines on the same block
    // key (a right-side name of length < lenBucket lands in bucket 0 too,
    // so boundary recall is preserved)
    val l = left.select(col(idL).as("lid"), col(nameL).as("__nl"),
        array_distinct(array(
          blk(nameL, s"GREATEST(0, length($nameL) - $maxDist) DIV $lenBucket"),
          blk(nameL, s"(length($nameL) + $maxDist) DIV $lenBucket"))).as("__blks"))
      .select(col("lid"), col("__nl"), explode(col("__blks")).as("__blk"))
    val r = right.select(col(idR).as("rid"), col(nameR).as("__nr"),
      blk(nameR, s"length($nameR) DIV $lenBucket").as("__blk"))
    l.join(r, Seq("__blk"))
      .withColumn("dist", levenshtein(col("__nl"), col("__nr")))
      .filter(col("dist") <= maxDist)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lid")).orderBy(col("dist"), col("rid"))))
      .filter(col("rn") === 1)
      // no dedup needed: the left's two buckets are distinct when they
      // differ, and the right carries exactly one bucket, so a (lid, rid)
      // pair joins through at most one block key
      .select(col("lid"), col("rid"), col("dist").cast("bigint").as("dist"))
  }
}
