package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distill a rule gate into a linear scorer — the "train a fasttext-style
  * quality classifier on weak labels" step of a pretraining pipeline
  * (CCNet / GPT-3-style quality filtering), reduced to its deterministic
  * core: a BATCH PERCEPTRON over integer (permil) text features.
  * Reference scope: Tajo has no ML surface at all; this is a pipeline
  * extension like Dedup/TextAnalysis (nearest reference analogue is the
  * aggregation machinery, `tajo-core/src/main/java/org/apache/tajo/engine/
  * planner/physical/HashAggregateExec.java:33`).
  *
  * Why a perceptron and not logistic regression: the batch perceptron
  * update is INTEGER-EXACT —
  *
  *   w_{t+1}[i] = w_t[i] + Σ_{docs with y·(w_t·x) <= 0} y · x[i]
  *
  * no learning rate, no sigmoid, no float anywhere — so a DuckDB oracle
  * replays training bit-for-bit (same trick as LinkGraph.pageRank), which
  * no float-gradient trainer allows. Fixed iteration count, no
  * convergence test.
  *
  * Scale: each iteration is ONE partial+final aggregation over the corpus
  * (the misclassified-sum), with the K-weight row broadcast — the corpus
  * never shuffles, nothing data-sized reaches the driver (weights live in
  * a 1-row DataFrame, localCheckpoint'd per round like pageRank's rank
  * table). Overflow bound: with permil features (≤1000) and D docs,
  * |w| ≤ iters·D·1000 and margins ≤ K·|w|·1000 — BIGINT holds through
  * D ≈ 10^11 docs at K=5, iters=4; downscale features further for more. */
object Distill {

  /** Train `iterations` batch-perceptron rounds from zero weights over
    * integer feature columns `fCols` and a ±1 label `yCol`. Returns a
    * 1-row DataFrame with columns w0..w(K-1) (BIGINT), one per feature. */
  def perceptron(feat: DataFrame, yCol: String, fCols: Seq[String],
                 iterations: Int): DataFrame = {
    require(iterations >= 1 && fCols.nonEmpty)
    val spark = feat.sparkSession
    val marginSql = fCols.zipWithIndex.map { case (f, i) => s"w$i * $f" }.mkString(" + ")
    var w = spark.range(1)
      .select(fCols.indices.map(i => lit(0L).as(s"w$i")): _*)
    for (_ <- 1 to iterations) {
      // coalesce: a global agg over ZERO rows yields NULL sums, which would
      // turn every weight NULL — empty input must keep zero weights (the
      // oracle CTE's LEFT JOIN spelling pins the same degenerate behavior)
      val delta = feat.crossJoin(broadcast(w))
        .withColumn("__m", col(yCol) * expr(marginSql))
        .agg(
          coalesce(sum(when(col("__m") <= 0, col(yCol) * col(fCols.head)).otherwise(0L)), lit(0L)).as("d0"),
          fCols.zipWithIndex.tail.map { case (f, i) =>
            coalesce(sum(when(col("__m") <= 0, col(yCol) * col(f)).otherwise(0L)), lit(0L)).as(s"d$i")
          }: _*)
      val next = w.crossJoin(broadcast(delta))
        .select(fCols.indices.map(i => (col(s"w$i") + col(s"d$i")).as(s"w$i")): _*)
        .localCheckpoint()
      Checkpoints.free(w) // superseded round (1 row, but one block per round)
      w = next
    }
    w
  }

  /** Score rows with trained weights: adds `margin` (= w·x, BIGINT) and
    * `pred` (= margin > 0). The weight row broadcasts; scoring is a
    * map-side projection at scan speed. */
  def score(feat: DataFrame, weights: DataFrame, fCols: Seq[String]): DataFrame = {
    val marginSql = fCols.zipWithIndex.map { case (f, i) => s"w$i * $f" }.mkString(" + ")
    feat.crossJoin(broadcast(weights))
      .withColumn("margin", expr(marginSql))
      .withColumn("pred", col("margin") > 0)
      .drop(fCols.indices.map(i => s"w$i"): _*)
  }

  /** DuckDB replay of [[perceptron]]: a CTE named `feat` with columns
    * (`yCol`, `fCols`...) must be in scope; emits w0..w`iterations` CTEs
    * (each 1 row, columns w0..w(K-1)) with the same integer arithmetic. */
  def perceptronOracleCtes(yCol: String, fCols: Seq[String], iterations: Int): String = {
    val init = fCols.indices.map(i => s"CAST(0 AS BIGINT) AS w$i").mkString(", ")
    val marginSql = fCols.zipWithIndex.map { case (f, i) => s"w.w$i * $f" }.mkString(" + ")
    val iters = (1 to iterations).map { t =>
      val deltas = fCols.zipWithIndex.map { case (f, i) =>
        s"CAST(COALESCE(SUM(CASE WHEN $yCol * ($marginSql) <= 0 THEN $yCol * $f ELSE 0 END), 0) AS BIGINT) AS d$i"
      }.mkString(",\n    ")
      val groupW = fCols.indices.map(i => s"w.w$i").mkString(", ")
      val next = fCols.indices.map(i => s"w.w$i + d.d$i AS w$i").mkString(", ")
      // LEFT JOIN (not comma join): an empty feat must still produce one
      // delta row per weight row (all zeros via the NULL-extended CASE →
      // ELSE 0 → COALESCE), matching Spark's coalesced global agg — a
      // comma join + GROUP BY would yield an EMPTY delta CTE instead
      s"""d$t AS (
         |  SELECT $deltas
         |  FROM w${t - 1} w LEFT JOIN feat ON TRUE GROUP BY $groupW
         |),
         |w$t AS (SELECT $next FROM w${t - 1} w, d$t d)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (SELECT $init),
       |$iters""".stripMargin
  }
}
