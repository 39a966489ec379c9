package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixing for training-data pipelines.
  *
  * Sampling is keyed on a Knuth multiplicative hash of a stable id rather
  * than RNG state, so a sample is (a) reproducible run-over-run, (b)
  * consistent across engines (the DuckDB oracle computes the same integer
  * arithmetic), and (c) stable under repartitioning — properties
  * `TABLESAMPLE`/`rand()` cannot give. Pure narrow projections: no
  * shuffle, runs at scan speed at any scale.
  */
object Sampling {

  /** See [[knuth32]] — exposed for operators/queries that need the same
    * engine-portable hash as a column expression. */
  private[graft] def knuth32Expr(idCol: String) = knuth32(idCol)

  /** hash in [0, 2^32) from a BIGINT id — Knuth multiplicative hash with
    * the id reduced mod 1e9+7 first: the raw `id * 2654435761` wraps the
    * 64-bit multiply for id >= ~3.47e9 (Spark wraps silently to negative —
    * the `< threshold` filter then keeps every such row — while DuckDB
    * errors on overflow). After the reduction the product is at most
    * ~2.66e18 < 2^63, so the arithmetic is exact in both engines at any id
    * scale; pmod guards the sign for negative ids. */
  private def knuth32(idCol: String) =
    expr(s"pmod(($idCol % 1000000007) * 2654435761, 4294967296)")

  /** Keep ~rate of rows, deterministically by id. */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(knuth32(idCol) < lit((rate * 4294967296.0).toLong))

  /** Per-stratum rates (e.g. downsample over-represented sources). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], default: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((default * 4294967296.0).toLong)) {
      case (acc, (k, r)) =>
        when(col(stratumCol) === k, lit((r * 4294967296.0).toLong)).otherwise(acc)
    }
    df.filter(knuth32(idCol) < threshold)
  }

  /** Deterministic train/val/test split assignment: the same Knuth hash
    * mapped onto cumulative-weight thresholds over the 32-bit hash domain.
    * Weights convert to exact integer boundaries once on the driver, so the
    * assignment is reproducible run-over-run, engine-portable (the DuckDB
    * oracle replays the arithmetic bit-exactly), and stable under
    * repartitioning — a row never migrates between train and test because
    * the cluster layout changed. Pure narrow projection — no shuffle;
    * downstream writes can partitionBy the split column. */
  def split(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
            splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split weights must sum to 1")
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(w => math.floor(w * 4294967296.0).toLong)
    val h = knuth32(idCol)
    val assigned = splits.init.zip(bounds.init).reverse.foldLeft(
      lit(splits.last._1): org.apache.spark.sql.Column) {
      case (acc, ((name, _), b)) => when(h < b, name).otherwise(acc)
    }
    df.withColumn(splitCol, assigned)
  }

  /** Keep the k best rows per group (e.g. the k highest-quality documents
    * per domain, the standard "top-k per source" curation gate). One hash
    * shuffle on the group key + a per-group sort — no global sort, no
    * driver collection; skewed groups are bounded because only k rows
    * survive each group. Ties break on `tieCol` so the result is
    * deterministic and engine-portable. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   k: Int, tieCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(scoreCol).desc, col(tieCol))
    df.withColumn("group_rank", row_number().over(w))
      .filter(col("group_rank") <= k)
  }

  /** Leakage-safe train/val/test split: near-duplicate documents MUST
    * land in the same split, or held-out metrics are contaminated by
    * training-set twins of the eval docs. Every doc draws its split from
    * the knuth32 hash of its duplicate-cluster representative
    * (`clusters` = [[Dedup.duplicateClusters]] output `(doc_id, keeper)`)
    * instead of its own id, so a whole cluster moves as one unit;
    * unclustered docs draw on their own id — identical to [[split]].
    *
    * Scale: one left equi-join corpus -> cluster table (pair-derived,
    * far smaller than the corpus; AQE free to broadcast it) plus the
    * same narrow hash projection as [[split]] — no extra shuffle of the
    * corpus beyond the join. */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                       splits: Seq[(String, Double)],
                       splitCol: String = "split"): DataFrame = {
    val keyed = df.join(
        clusters.select(col("doc_id").as("__cid"), col("keeper").as("__keeper")),
        df(idCol) === col("__cid"), "left")
      .withColumn("__split_key", coalesce(col("__keeper"), df(idCol)))
      .drop("__cid", "__keeper")
    split(keyed, "__split_key", splits, splitCol).drop("__split_key")
  }

  /** Weighted sample of exactly k rows without replacement — priority
    * sampling (Duffield/Lund/Thorup, JACM 2007): each row draws priority
    * q = w / u with u uniform in (0, 1]; the k highest-priority rows form
    * the sample, so inclusion probability rises with weight and the scheme
    * admits an unbiased subset-sum estimator. Here u is the deterministic
    * [[knuth32]] hash scaled into (0, 2^32] and the division is exact
    * integer arithmetic — `pri = w * 2^32 DIV (h + 1)` — so the sample
    * replays bit-identically in any engine. Weights are clamped to
    * 2^31 - 1 (keeps w * 2^32 < 2^63 — document weights beyond that lose
    * proportionality, not determinism); non-positive weights are dropped
    * (they can never be sampled).
    *
    * Scale: a narrow projection plus top-k — Spark plans the
    * ORDER BY + LIMIT as TakeOrderedAndProject (per-partition heaps, k
    * rows to the driver-side merge), never a global sort. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame =
    df.filter(col(weightCol) > 0)
      .withColumn("sample_pri", expr(
        s"(LEAST($weightCol, 2147483647) * 4294967296) DIV " +
        s"(pmod(($idCol % 1000000007) * 2654435761, 4294967296) + 1)"))
      .orderBy(col("sample_pri").desc, col(idCol))
      .limit(k)

  /** Deterministic global shuffle: order the corpus by the Knuth hash of a
    * stable id (id as tiebreak). Training pipelines need a reproducible
    * permutation before sharding; `ORDER BY rand()` changes run-over-run
    * and under repartitioning, this does not. The sort is one range
    * exchange (Spark samples range bounds), after which each output
    * partition is a contiguous slice of the permutation — write them out
    * as shards directly. */
  def deterministicShuffle(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("shuffle_key", knuth32(idCol))
      .orderBy(col("shuffle_key"), col(idCol))

  /** Temperature-based source rebalancing: downsample over-represented
    * sources so the expected kept count per source is proportional to
    * n_i^alpha (the standard multilingual-corpus "temperature" mix). The
    * smallest source keeps everything; a source m times larger keeps
    * m^(alpha-1) of its rows. Two jobs: a per-source count (K rows,
    * broadcast back) and a narrow filter — no data-sized driver pull, no
    * extra shuffle on the corpus itself.
    *
    * Determinism across engines: rates for the default alpha=0.5 are
    * sqrt(n_min/n_i) — IEEE-754 requires sqrt and divide to be correctly
    * rounded, so DuckDB computes the identical double, the identical
    * floor(rate*2^32) threshold, and the identical kept set. Other alphas
    * route through pow(), which carries no such guarantee — fine for
    * production, not for a bit-exact oracle. */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
                     alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min("__n").as("__n_min"))
    val rate =
      if (alpha == 0.5) sqrt(col("__n_min").cast("double") / col("__n").cast("double"))
      else pow(col("__n_min").cast("double") / col("__n").cast("double"), 1.0 - alpha)
    val thresholds = counts.crossJoin(broadcast(minN))
      .withColumn("__threshold", floor(rate * lit(4294967296.0)))
      .select(col(sourceCol), col("__threshold"))
    df.join(broadcast(thresholds), sourceCol)
      .filter(knuth32(idCol) < col("__threshold"))
      .drop("__threshold")
  }

  /** Deterministic round-robin interleave across sources: orders rows by
    * (position-within-source, source), the standard way to mix corpora so
    * a training run doesn't see one source in a long block. The returned
    * frame carries `mix_order`; a global sort on it is one range shuffle. */
  def interleave(df: DataFrame, sourceCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(sourceCol).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("mix_order",
        struct(col("__rn"), col(sourceCol)))
      .drop("__rn")
  }

  /** Epoch-schedule planner for a fixed token budget ("data-constrained"
    * mixing, Muennighoff et al. 2023: repeating a source beyond ~4 epochs
    * stops helping, so allocation must respect a per-source repeat cap).
    * Given per-row token counts, plan how many tokens to draw from each
    * source:
    *
    *   1. fair share  F = budget DIV n_sources;
    *   2. first pass  a1_s = LEAST(F, maxEpochs * N_s)  — small sources
    *      cap out at maxEpochs full repeats;
    *   3. the leftover L = budget - SUM(a1) redistributes proportionally
    *      to remaining capacity, itself capped: extra_s =
    *      LEAST(L * capRem_s DIV SUM(capRem), capRem_s).
    *
    * One redistribution round, all-BIGINT arithmetic: the plan never
    * exceeds a source's cap, never exceeds the budget, and under-allocates
    * at most by integer-division residue (callers top up the largest
    * source if they need the budget met exactly). Returns one row per
    * source: n_tokens, alloc_tokens, full_epochs, remainder_tokens.
    *
    * Scale: one partial+final SUM per source, then all remaining
    * arithmetic happens on the n_sources-row table — bounded by
    * construction (sources are corpora, not documents), so the two scalar
    * cross joins broadcast a 1-row frame each and nothing data-sized moves.
    */
  def epochSchedule(df: DataFrame, sourceCol: String, tokensCol: String,
                    budget: Long, maxEpochs: Int = 4): DataFrame = {
    require(budget >= 0 && maxEpochs >= 1, "need budget >= 0 and maxEpochs >= 1")
    val counts = df.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).cast("bigint").as("n_tokens"))
    val nSrc = counts.agg(count(lit(1)).as("__s"))
    val pass1 = counts.crossJoin(broadcast(nSrc))
      .withColumn("__cap", expr(s"n_tokens * $maxEpochs"))
      .withColumn("__a1", expr(s"LEAST($budget DIV __s, __cap)"))
    val totals = pass1.agg(sum("__a1").as("__a1sum"),
      sum(expr("__cap - __a1")).as("__capremsum"))
    pass1.crossJoin(broadcast(totals))
      // the proportional product L * capRem can reach ~1e26 at 100 TB-scale
      // budgets — route it through DECIMAL(38,0) (exact integral `div`, no
      // rounding) instead of overflowing BIGINT
      .withColumn("__extra", expr(
        s"""CASE WHEN __capremsum > 0
           |  THEN LEAST(CAST(CAST($budget - __a1sum AS DECIMAL(38,0))
           |               * (__cap - __a1) DIV __capremsum AS BIGINT),
           |             __cap - __a1)
           |  ELSE 0 END""".stripMargin))
      .select(col(sourceCol), col("n_tokens"),
        expr("__a1 + __extra").as("alloc_tokens"),
        expr("CASE WHEN n_tokens > 0 THEN (__a1 + __extra) DIV n_tokens ELSE 0 END")
          .as("full_epochs"),
        expr("CASE WHEN n_tokens > 0 THEN (__a1 + __extra) % n_tokens ELSE 0 END")
          .as("remainder_tokens"))
  }
}
