package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: pair each left row with every right
  * interval [startCol, endCol] containing its pointCol, with an optional
  * equi-key.
  *
  * Spark plans a bare `ON point BETWEEN start AND end` as a nested-loop /
  * cartesian (the reference could only express it as cross join + filter —
  * SURVEY.md §2.3). This operator grids time into buckets: each interval
  * is exploded onto the buckets it covers, each point maps to exactly one
  * bucket, and the join becomes an equi-join on (key, bucket) plus a cheap
  * residual BETWEEN. Each (point, interval) pair meets in exactly one
  * bucket — the point's own — so no dedup is needed.
  *
  * Scale: shuffle volume is |left| + |right| * avg_buckets_per_interval,
  * hash-partitioned — linear in executors, no O(n*m) blowup. Pick the
  * bucket UNIT (hour/day/month — always a count of one, see
  * [[bucketUnit]]) close to the typical interval length: too fine
  * multiplies interval replication, too coarse packs unrelated rows
  * into one bucket and shifts work to the residual filter.
  */
object RangeJoin {

  /** The bucket spec must be exactly ONE truncation unit ("1 hour",
    * "1 month"): a multi-unit grid ("2 hours") would start each row's
    * sequence at its own truncated start, so two rows' grids misalign and
    * overlapping pairs silently never meet. The granularity knob is the
    * UNIT, not a count. */
  private def bucketUnit(bucket: String): String = {
    val parts = bucket.trim.split("\\s+")
    require(parts.length == 1 || parts.head == "1",
      s"bucket must be one truncation unit (e.g. '1 hour', '1 month'), got " +
      s"'$bucket' — multi-unit grids step from each row's own truncated " +
      "start, misalign across rows, and silently drop matches")
    parts.last.toUpperCase.stripSuffix("S")
  }

  def pointInInterval(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      pointCol: String, startCol: String, endCol: String,
                      bucket: String = "1 month"): DataFrame = {
    val unit = bucketUnit(bucket)
    def trunc(c: Column) = date_trunc(unit, c)
    val l = left.withColumn("__bucket", trunc(col(pointCol)))
    val r = right.withColumn("__bucket",
      explode(sequence(trunc(col(startCol)), trunc(col(endCol)),
        expr(s"INTERVAL $bucket"))))
    l.join(r, l("__bucket") === r("__bucket") &&
        l(leftKey) === r(rightKey) &&
        l(pointCol) >= r(startCol) && l(pointCol) <= r(endCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: pair each left interval [lStart, lEnd] with
    * every right interval [rStart, rEnd] that overlaps it (closed-interval
    * `lStart <= rEnd AND rStart <= lEnd`) under an equi-key — the span
    * merge/containment primitive (dedup span reconciliation, session vs
    * promo windows, validity-interval alignment).
    *
    * Both sides explode onto the grid buckets they cover, so an
    * overlapping pair meets in EVERY shared bucket; the join keeps only
    * the canonical meeting — the later interval's start bucket
    * (`greatest(trunc(lStart), trunc(rStart))`), which both sides cover
    * exactly when they overlap at bucket granularity — so each pair
    * survives once and no post-join dedup shuffle is needed.
    *
    * Scale: shuffle volume is (|left| + |right|) * avg_buckets_per_interval
    * hash-partitioned on (key, bucket) — linear, never O(n*m); the same
    * bucket-width trade as [[pointInInterval]] applies to BOTH sides. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucket: String = "1 month"): DataFrame = {
    val unit = bucketUnit(bucket)
    def trunc(c: Column) = date_trunc(unit, c)
    val l = left.withColumn("__bucket",
      explode(sequence(trunc(col(lStart)), trunc(col(lEnd)),
        expr(s"INTERVAL $bucket"))))
    val r = right.withColumn("__bucket",
      explode(sequence(trunc(col(rStart)), trunc(col(rEnd)),
        expr(s"INTERVAL $bucket"))))
    l.join(r, l("__bucket") === r("__bucket") &&
        l(leftKey) === r(rightKey) &&
        l(lStart) <= r(rEnd) && r(rStart) <= l(lEnd) &&
        l("__bucket") === greatest(trunc(l(lStart)), trunc(r(rStart))))
      .drop("__bucket")
  }

  /** Distribution-rank (CDF) count join: for every left row, the COUNT of
    * right values strictly below the left value — the scalable spelling of
    * the `JOIN ON rightVal < leftVal` theta join, which Spark (like the
    * reference's cross-join+filter) can only plan as a nested loop: the
    * sf1 stress measured that shape at exponent 1.69/decade (O(n·m) pairs
    * by definition). Here it decomposes into
    *
    *   1. bucket the right values on a fixed width (one hash aggregation);
    *   2. prefix-sum the BUCKET table (bounded by value-range/width — the
    *      precondition, same class as the morton stats — so the single
    *      unpartitioned window is over a bounded table, never the data);
    *   3. every left row = its bucket's prefix (broadcast lookup)
    *      + an equi-join on the ONE shared bucket for the residual strict
    *      compare (per-left fan-out = one bucket's occupancy, the width
    *      knob).
    *
    * Values below/above the right range short-circuit to 0/total. Returns
    * the left rows (keyed by the UNIQUE `leftKey`) with `asCol` appended;
    * zero-count rows are kept (filter afterwards for inner-join
    * semantics). Shuffle volume is |left| + |right| — linear. */
  def cdfCountJoin(left: DataFrame, leftKey: String, leftVal: String,
                   right: DataFrame, rightVal: String,
                   bucketWidth: Double, asCol: String = "below_count"): DataFrame = {
    require(bucketWidth > 0, s"need bucketWidth > 0, got $bucketWidth")
    import org.apache.spark.sql.expressions.Window
    def b(c: String) = expr(s"CAST(FLOOR(($c) / $bucketWidth) AS BIGINT)")
    val rb = right.select(b(rightVal).as("__b"), col(rightVal).as("__v"))
    val counts = rb.groupBy("__b").agg(count(lit(1)).as("__c"))
    // three driver scalars (bounded), for the clamp and the densify range
    val s = rb.agg(min("__b"), max("__b"), count(lit(1))).head
    if (s.isNullAt(0)) // empty right side: every left count is 0
      return left.withColumn(asCol, lit(0L))
    val (minB, maxB, total) = (s.getLong(0), s.getLong(1), s.getLong(2))
    // densified bucket table: absent buckets still carry their prefix, so
    // a left value landing in an empty bucket reads the right base count
    val prefix = left.sparkSession.range(minB, maxB + 1)
      .select(col("id").as("__b"))
      .join(counts, Seq("__b"), "left")
      .na.fill(0L, Seq("__c"))
      .withColumn("__below", coalesce(sum("__c").over(
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val l = left.withColumn("__lb", b(leftVal))
    val base = l
      .join(broadcast(prefix.select(col("__b").as("__lb"), col("__below"))), Seq("__lb"), "left")
      .withColumn("__base",
        when(col("__lb") < minB, lit(0L))
          .when(col("__lb") > maxB, lit(total))
          .otherwise(col("__below")))
    val within = l.select(col(leftKey).as("__wk"), col("__lb"), col(leftVal).as("__lv"))
      .join(rb.withColumnRenamed("__b", "__lb"), Seq("__lb"))
      .filter(col("__v") < col("__lv"))
      .groupBy("__wk").agg(count(lit(1)).as("__win"))
    base.join(within, base(leftKey) === within("__wk"), "left")
      .withColumn(asCol, col("__base") + coalesce(col("__win"), lit(0L)))
      .drop("__lb", "__below", "__base", "__wk", "__win")
  }
}
