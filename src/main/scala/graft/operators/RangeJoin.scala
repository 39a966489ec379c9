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
}
