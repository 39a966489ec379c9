package graft.queries

import graft.QueryDef
import graft.QueryDef.{shared, split}

/** Relational core: scan/filter/project, all join types, aggregation
  * (plain, multi-DISTINCT, rollup/cube/grouping sets), window functions
  * with frames, sort/limit, set operations, subqueries.
  *
  * Operator-by-operator mapping from the reference's physical layer
  * (reference: tajo-core/src/main/java/org/apache/tajo/engine/planner/
  * physical/ — SeqScanExec, SelectionExec, ProjectionExec, HashJoinExec
  * family, MergeJoinExec family, HashAggregateExec, DistinctGroupby*,
  * WindowAggExec, ExternalSortExec, LimitExec, UnionExec, HavingExec),
  * re-expressed declaratively so Catalyst chooses the physical algorithm
  * (broadcast vs shuffled-hash vs sort-merge, partial aggregation, AQE).
  */
object CoreQueries {

  // ---- scans, filter, projection (SeqScanExec/SelectionExec/ProjectionExec)

  private val q1Agg = shared("q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin, headline = true)

  private val qScanFilter = shared("q2_scan_filter",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' AND l_discount > 0.05 AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin)

  // ---- joins (HashJoinExec/MergeJoinExec family; algorithm choice is
  //      Catalyst's: broadcast for the dims, shuffle for fact-fact)

  private val q3Topk = shared("q3_join_topk",
    """SELECT o_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin, headline = true)

  private val q5Join = shared("q5_join_multi",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin, headline = true)

  private val q14Promo = shared("q14_conditional_agg",
    """SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
      |    ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin, headline = true)

  private val qJoinLeft = shared("q_join_left",
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total_spent
      |FROM customer LEFT JOIN orders
      |  ON c_custkey = o_custkey AND o_orderstatus = 'F'
      |GROUP BY c_custkey, c_name
      |ORDER BY c_custkey""".stripMargin)

  private val qJoinRight = shared("q_join_right",
    """SELECT n_nationkey, n_name, COUNT(c_custkey) AS cust_cnt
      |FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_nationkey, n_name
      |ORDER BY n_nationkey""".stripMargin)

  private val qJoinFull = shared("q_join_full",
    """SELECT COALESCE(o_orderkey, l_orderkey) AS okey, o_totalprice, l_quantity
      |FROM (SELECT * FROM orders WHERE o_orderkey % 3 = 0) o
      |FULL JOIN (SELECT * FROM lineitem WHERE l_orderkey % 3 = 1 AND l_linenumber = 1) l
      |  ON o_orderkey = l_orderkey
      |ORDER BY okey""".stripMargin)

  private val qJoinSemi = shared("q_join_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin)

  private val qJoinAnti = shared("q_join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin)

  private val qJoinCross = shared("q_join_cross",
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin)

  private val qJoinNonEqui = shared("q_join_nonequi",
    """SELECT s_suppkey, COUNT(*) AS cheaper_parts
      |FROM supplier JOIN part ON p_retailprice < s_acctbal
      |GROUP BY s_suppkey
      |ORDER BY s_suppkey""".stripMargin)

  // ---- aggregation (HashAggregateExec, DistinctGroupby* 3-stage plan →
  //      Catalyst RewriteDistinctAggregates Expand-based plan)

  private val qAggDistinct = shared("q_agg_multi_distinct",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS d_supp,
      |  COUNT(DISTINCT l_partkey) AS d_part,
      |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_d_qty,
      |  COUNT(*) AS cnt
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin, headline = true)

  private val qRollup = shared("q_groupby_rollup",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS qty,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g1,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g2
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY g1, g2, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin)

  private val qCube = shared("q_groupby_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin)

  private val qGroupingSets = shared("q_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin)

  private val qHaving = shared("q_having",
    """SELECT l_suppkey, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS volume
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING COUNT(*) > 400
      |ORDER BY l_suppkey""".stripMargin)

  private val qStddev = shared("q_agg_stats",
    """SELECT l_returnflag,
      |  CAST(CAST(STDDEV_SAMP(l_quantity) AS DECIMAL(28,4)) AS DOUBLE) AS sd_qty,
      |  CAST(CAST(STDDEV_POP(l_quantity) AS DECIMAL(28,4)) AS DOUBLE) AS sdp_qty,
      |  CAST(CAST(VAR_SAMP(l_discount) AS DECIMAL(28,8)) AS DOUBLE) AS var_disc,
      |  CAST(CAST(CORR(l_quantity, l_extendedprice) AS DECIMAL(28,6)) AS DOUBLE) AS corr_qp,
      |  CAST(MIN(l_quantity) AS DOUBLE) AS min_q, CAST(MAX(l_quantity) AS DOUBLE) AS max_q
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin)

  // ---- window functions (WindowAggExec; frames per Plan.proto:496-512)

  private val qWindowRank = shared("q_window_rank",
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
      |  CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT) AS rnk,
      |  CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT) AS drnk,
      |  CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin)

  private val qWindowOffset = shared("q_window_offset",
    """SELECT o_orderkey,
      |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
      |  LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
      |  FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
      |  LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin, headline = true)

  private val qWindowRunning = shared("q_window_running",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
      |  CAST(COUNT(*) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
      |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS neighbors
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)

  // partitioned by o_custkey (high-cardinality) so the same query shape is
  // scale-safe: each customer's orders fit one task even at 100 TB, unlike
  // a low-cardinality status key that would funnel the table into 3 tasks
  private val qWindowRange = shared("q_window_range",
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
      |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_cheaper
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin)

  private val qWindowCume = shared("q_window_cume",
    """SELECT o_orderkey,
      |  PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS pct_rnk,
      |  CUME_DIST() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS cume
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin)

  // ---- sort / limit (ExternalSortExec + distributed RANGE_SHUFFLE →
  //      Spark RangePartitioning; limit → TakeOrderedAndProject)

  private val qSortLimit = shared("q_sort_limit",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey
      |LIMIT 100""".stripMargin, headline = true)

  private val qSortNulls = shared("q_sort_nulls",
    """SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st
      |FROM orders
      |ORDER BY st ASC NULLS FIRST, o_orderkey
      |LIMIT 1000""".stripMargin)

  // ---- set operations (UnionExec; SortIntersectExec is dead code in the
  //      reference — we exceed it with native INTERSECT/EXCEPT)

  private val qUnionAll = shared("q_union_all",
    """SELECT k, COUNT(*) AS cnt FROM (
      |  SELECT c_nationkey AS k FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS k FROM supplier
      |) u GROUP BY k ORDER BY k""".stripMargin)

  private val qUnionDistinct = shared("q_union_distinct",
    """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 0
      |UNION
      |SELECT s_nationkey AS k FROM supplier
      |ORDER BY k""".stripMargin)

  private val qIntersect = shared("q_intersect",
    """SELECT c_nationkey AS k FROM customer
      |INTERSECT
      |SELECT s_nationkey AS k FROM supplier
      |ORDER BY k""".stripMargin)

  private val qExcept = shared("q_except",
    """SELECT c_nationkey AS k FROM customer
      |EXCEPT
      |SELECT s_nationkey AS k FROM supplier
      |ORDER BY k""".stripMargin)

  // q_except's honest answer on this data is zero rows (every customer
  // nation also hosts a supplier) — a bug that dropped ALL rows would
  // still pass it. This companion is non-empty at every SF, so the
  // EXCEPT operator has a rows>0 driver check too.
  private val qExcept2 = shared("q_except_nonempty",
    """SELECT c_nationkey AS k FROM customer
      |EXCEPT
      |SELECT n_nationkey AS k FROM nation WHERE n_regionkey <> 2
      |ORDER BY k""".stripMargin)

  // ---- subqueries (InSubqueryRewriteRule → semi/anti; scalar subqueries)

  private val qExists = shared("q_exists_correlated",
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_suppkey = s_suppkey AND l_quantity > 49)
      |ORDER BY s_suppkey""".stripMargin)

  private val qScalarSub = shared("q_scalar_subquery",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > 1.8 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) FROM orders)
      |ORDER BY o_orderkey""".stripMargin)

  private val qInSubUncorrelated = shared("q_in_subquery",
    """SELECT p_partkey, p_name FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 50)
      |ORDER BY p_partkey""".stripMargin)

  // ---- expressions: CASE/BETWEEN/LIKE/IN-list/CAST (EvalNode tree →
  //      codegen'd Catalyst expressions)

  private val qCaseWhen = shared("q_case_when",
    """SELECT
      |  CASE WHEN o_totalprice BETWEEN 0 AND 50000 THEN 'low'
      |       WHEN o_totalprice <= 150000 THEN 'mid'
      |       ELSE 'high' END AS bucket,
      |  CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 ELSE 0 END AS st,
      |  CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority IN ('2-HIGH') THEN 1 ELSE 0 END AS urgent,
      |  COUNT(*) AS cnt
      |FROM orders
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin)

  // NULL semantics corners (reference suite TestNullValues): aggregates
  // skip nulls, COUNT(*) vs COUNT(col), all-null groups, three-valued
  // logic in filters, NULL-safe equality.
  private val qNullSemantics = split("q_null_semantics",
    """SELECT o_orderstatus,
      |  COUNT(*) AS n_rows,
      |  COUNT(v) AS n_nonnull,
      |  COUNT(DISTINCT v) AS n_distinct,
      |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
      |  CAST(SUM(CASE WHEN v IS NULL THEN CAST(1 AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_allnull_arm,
      |  MIN(v) AS min_v, MAX(v) AS max_v,
      |  COUNT(CASE WHEN v <=> NULL THEN 1 END) AS n_nullsafe_eq_null
      |FROM (SELECT o_orderstatus, NULLIF(o_orderkey % 4, 0) AS v FROM orders) t
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin,
    """SELECT o_orderstatus,
      |  COUNT(*) AS n_rows,
      |  COUNT(v) AS n_nonnull,
      |  COUNT(DISTINCT v) AS n_distinct,
      |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
      |  CAST(SUM(CASE WHEN v IS NULL THEN CAST(1 AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_allnull_arm,
      |  MIN(v) AS min_v, MAX(v) AS max_v,
      |  COUNT(CASE WHEN v IS NOT DISTINCT FROM NULL THEN 1 END) AS n_nullsafe_eq_null
      |FROM (SELECT o_orderstatus, NULLIF(o_orderkey % 4, 0) AS v FROM orders) t
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin)

  // Second math batch: div (Tajo integer division fn), IEEE-754-exact
  // operations only (reference: engine/function/math/Div.java, Sqrt.java,
  // AbsDouble.java, SignFloat8.java, FloorFloat8.java, CeilFloat8.java,
  // RoundFloat8.java). Trig (ATAN/ASIN/ACOS/TAN) is libm-dependent — no
  // IEEE-mandated exact result, so different libm builds differ by 1 ulp
  // and flip decimal rounding on boundary rows; trig parity is asserted
  // with a 1e-12 tolerance in FunctionsSpec instead of hash comparison.
  // ROUND-on-DECIMAL-division is likewise excluded: DuckDB routes DECIMAL/int
  // through DOUBLE on some builds, flipping half-up ties — div7_e4 below keeps
  // the same quotient as pure BIGINT floor division (price in cents via
  // IEEE-exact FLOOR, never a double->BIGINT cast of a fractional value,
  // which Spark truncates but DuckDB rounds). Decimal-round parity is a
  // tolerance test in FunctionsSpec ("decimal ROUND of a division").
  private val qMath2 = split("q_func_math2",
    """SELECT l_orderkey, l_linenumber,
      |  div(CAST(l_partkey AS BIGINT), 7) AS idiv,
      |  CAST(l_partkey AS BIGINT) % 7 AS imod,
      |  SQRT(CAST(l_partkey AS DOUBLE)) AS sq,
      |  ABS(CAST(l_discount AS DOUBLE) - 0.05) AS ab,
      |  CAST(SIGN(CAST(l_discount AS DOUBLE) - 0.05) AS BIGINT) AS sg,
      |  CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) / 100) AS BIGINT) AS flr,
      |  CAST(CEIL(CAST(l_extendedprice AS DOUBLE) / 100) AS BIGINT) AS cl,
      |  (CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) * 100) DIV 7 AS div7_e4
      |FROM lineitem WHERE l_orderkey % 40 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_partkey AS BIGINT) // 7 AS idiv,
      |  CAST(l_partkey AS BIGINT) % 7 AS imod,
      |  SQRT(CAST(l_partkey AS DOUBLE)) AS sq,
      |  ABS(CAST(l_discount AS DOUBLE) - 0.05) AS ab,
      |  CAST(SIGN(CAST(l_discount AS DOUBLE) - 0.05) AS BIGINT) AS sg,
      |  CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) / 100) AS BIGINT) AS flr,
      |  CAST(CEIL(CAST(l_extendedprice AS DOUBLE) / 100) AS BIGINT) AS cl,
      |  (CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) * 100) // 7 AS div7_e4
      |FROM lineitem WHERE l_orderkey % 40 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin)

  // Exact interpolated percentiles (beyond the reference's aggregate set;
  // Spark percentile == DuckDB quantile_cont, both linear interpolation).
  private val qPercentile = split("q_agg_percentile",
    """SELECT l_returnflag,
      |  CAST(CAST(PERCENTILE(l_quantity, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS med_qty,
      |  CAST(CAST(PERCENTILE(l_quantity, 0.9) AS DECIMAL(18,6)) AS DOUBLE) AS p90_qty,
      |  CAST(CAST(PERCENTILE(l_extendedprice, 0.25) AS DECIMAL(18,4)) AS DOUBLE) AS p25_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin,
    """SELECT l_returnflag,
      |  CAST(CAST(QUANTILE_CONT(l_quantity, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS med_qty,
      |  CAST(CAST(QUANTILE_CONT(l_quantity, 0.9) AS DECIMAL(18,6)) AS DOUBLE) AS p90_qty,
      |  CAST(CAST(QUANTILE_CONT(l_extendedprice, 0.25) AS DECIMAL(18,4)) AS DOUBLE) AS p25_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin)

  private val qDistinct = shared("q_select_distinct",
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)

  // SELECT-without-FROM (EvalExprExec → Catalyst OneRowRelation)
  private val qEvalExpr = shared("q_eval_expr",
    """SELECT CAST(1 + 1 AS BIGINT) AS two,
      |  CAST(LENGTH('hello') AS BIGINT) AS len5,
      |  CONCAT('a', 'b', 'c') AS abc,
      |  COALESCE(NULL, 'x') AS cx,
      |  CAST(10 AS DOUBLE) / 4 AS d,
      |  UPPER('tajo') AS up""".stripMargin)

  val all: Seq[QueryDef] = Seq(
    q1Agg, qScanFilter, q3Topk, q5Join, q14Promo,
    qJoinLeft, qJoinRight, qJoinFull, qJoinSemi, qJoinAnti, qJoinCross, qJoinNonEqui,
    qAggDistinct, qRollup, qCube, qGroupingSets, qHaving, qStddev,
    qWindowRank, qWindowOffset, qWindowRunning, qWindowRange, qWindowCume,
    qSortLimit, qSortNulls,
    qUnionAll, qUnionDistinct, qIntersect, qExcept, qExcept2,
    qExists, qScalarSub, qInSubUncorrelated,
    qCaseWhen, qDistinct, qEvalExpr, qNullSemantics, qMath2, qPercentile)
}
