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
  * hash-partitioned — linear in executors, no O(n*m) blowup. Pick
  * `bucket` (default 1 month) close to the typical interval length: too
  * fine multiplies interval replication, too coarse packs unrelated rows
  * into one bucket and shifts work to the residual filter.
  */
object RangeJoin {

  def pointInInterval(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      pointCol: String, startCol: String, endCol: String,
                      bucket: String = "1 month"): DataFrame = {
    val unit = bucket.trim.split("\\s+").last.toUpperCase.stripSuffix("S")
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
}
