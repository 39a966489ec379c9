package graft.queries

import graft.QueryDef
import graft.QueryDef.shared

/** TPC-H-derived workload beyond the reference's own five benchmark queries.
  *
  * The reference validates Q1, Q2(4-join), Q5, Q7(first join), Q14
  * (reference: tajo-core-tests/src/test/java/org/apache/tajo/benchmark/
  * TestTPCH.java:34-67); Q1/Q5/Q14 live in CoreQueries. This file adds the
  * rest of the TPC-H patterns expressible over the driver's synthetic star
  * schema (no partsupp table; lineitem lacks commitdate/receiptdate/shipmode,
  * so Q4/Q12/Q21 are adapted to the available columns). Each query follows
  * the QueryDef determinism contract: DECIMAL-routed double aggregation,
  * total ORDER BY, BIGINT casts on computed ints.
  *
  * Scale notes: every query is a declarative Spark SQL plan — Catalyst
  * broadcasts the dim sides, keeps aggregations partial+final, and rewrites
  * the IN/EXISTS subqueries to semi joins; AQE handles skew at real scale.
  */
object TpchQueries {

  // Q6 — forecasting revenue change: pure scan + filter + global agg.
  private val q6 = shared("q6_forecast_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin, headline = true)

  // Q7 — volume shipping between two nations (self-join of nation on both
  // ends of the supplier/customer relationship).
  private val q7 = shared("q7_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(volume) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                       AND TIMESTAMP '1997-12-31 00:00:00'
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)

  // Q4 (adapted: no l_commitdate/l_receiptdate in the synthetic schema —
  // the EXISTS probes late-shipping lines instead of late-receipt ones).
  private val q4 = shared("q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin)

  // Q10 — returned-item reporting: fact-fact join + dim, top 20 by revenue.
  private val q10 = shared("q10_returned_items",
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin, headline = true)

  // Q13 — customer order-count distribution (outer join with an ON-clause
  // filter, then an aggregation of an aggregation).
  private val q13 = shared("q13_customer_distribution",
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin)

  // Q15 — top supplier: CTE reused twice (revenue per supplier + its max).
  private val q15 = shared("q15_top_supplier",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin)

  // Q17 — small-quantity-order revenue: correlated scalar subquery against
  // the per-part average (sum of integral doubles is exact, so the 0.2*avg
  // threshold is order-independent).
  private val q17 = shared("q17_small_quantity",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#3'
      |  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = p_partkey)""".stripMargin)

  // Q18 — large-volume customers: IN over a HAVING aggregate.
  private val q18 = shared("q18_large_volume",
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 300)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin, headline = true)

  // Q19 (adapted: no l_shipinstruct/l_shipmode) — disjunctive multi-column
  // join predicates that Catalyst splits into a common equi-join key plus
  // per-branch residual filters.
  private val q19 = shared("q19_disjunctive_filters",
    """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin)

  // Q22 (adapted: no c_phone — country code derived from c_nationkey) —
  // anti join + uncorrelated scalar-average threshold.
  private val q22 = shared("q22_global_sales_opportunity",
    """SELECT cntrycode, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS totacctbal
      |FROM (
      |  SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal, c_custkey
      |  FROM customer
      |  WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*)
      |                     FROM customer WHERE c_acctbal > 0.0)
      |) hot
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin)

  // Q9 (adapted: no partsupp, so supply cost is modeled as 60% of the
  // part's retail price) — product-type profit by nation and year: the
  // 5-way join + expression-heavy aggregation shape.
  private val q9 = shared("q9_product_profit",
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation,
      |    CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice * (1 - l_discount)
      |         - 0.6 * p_retailprice * l_quantity AS DECIMAL(38,6)) AS amount
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%red%'
      |) profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin)

  // Q11 (adapted: value concentration over lineitem instead of partsupp) —
  // the group-then-filter-by-uncorrelated-scalar-subquery shape.
  private val q11 = shared("q11_important_stock",
    """SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS value
      |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |WHERE s_nationkey = 3
      |GROUP BY l_partkey
      |HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) >
      |  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / 500
      |   FROM lineitem JOIN supplier ON s_suppkey = l_suppkey WHERE s_nationkey = 3)
      |ORDER BY value DESC, l_partkey""".stripMargin)

  // Q12 (adapted: no l_shipmode — lines classify late/on-time by shipdate
  // lag instead) — the conditional two-branch count shape.
  private val q12 = shared("q12_shipping_priority_class",
    """SELECT shipclass,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM (
      |  SELECT o_orderpriority,
      |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 'late' ELSE 'on-time' END AS shipclass
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |) t
      |GROUP BY shipclass
      |ORDER BY shipclass""".stripMargin)

  // Q16 (adapted: supplier relationships via lineitem instead of partsupp) —
  // the NOT-IN-subquery + COUNT(DISTINCT) by attribute shape.
  private val q16 = shared("q16_parts_supplier",
    """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin)

  // Q21 (adapted: no l_commitdate — "kept waiting" = shipped >60 days after
  // the order date) — the double correlated EXISTS / NOT EXISTS shape: the
  // supplier shipped late on a multi-supplier order where every OTHER
  // supplier shipped on time.
  private val q21 = shared("q21_suppliers_kept_waiting",
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |  AND n_name = 'NATION_1'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin)

  // Q2/Q20 need the partsupp table the driver's testdata does not ship.
  // Rather than leaving them unrunnable, partsupp is SYNTHESIZED as a
  // deterministic CTE (4 suppliers per part, key/cost/availqty from pure
  // integer arithmetic over the actual key domains — the same synthesis
  // idiom as the pipeline URL fixtures), spelled identically in both
  // engines, so the full Q2/Q20 query logic is oracle-verified; only the
  // partsupp DATA is synthetic. Costs stay integer cents to keep the
  // correlated MIN exact.
  private val partsuppCte =
    """partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    ((p_partkey * 7 + i.i * 13) % (SELECT COUNT(*) FROM supplier))
      |      + (SELECT MIN(s_suppkey) FROM supplier) AS ps_suppkey,
      |    CAST(((p_partkey * 31 + i.i * 17) % 90000) + 100 AS BIGINT) AS ps_supplycost_cents,
      |    CAST(((p_partkey * 13 + i.i * 7) % 9999) + 1 AS BIGINT) AS ps_availqty
      |  FROM part CROSS JOIN
      |    (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3) i
      |)""".stripMargin

  // Q2 — minimum-cost supplier per part in a region (the reference's own
  // benchmark query, TestTPCH.java:34-67): correlated MIN over the
  // region-restricted partsupp. Output adapted to the available supplier
  // columns (no s_address/s_phone/s_comment/p_mfgr in the testdata).
  private val q2 = shared("q2_min_cost_supplier",
    s"""WITH $partsuppCte
       |SELECT s_acctbal, s_name, n_name, p_partkey, ps.ps_suppkey, ps_supplycost_cents
       |FROM partsupp ps
       |JOIN part ON p_partkey = ps_partkey
       |JOIN supplier ON s_suppkey = ps.ps_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
       |  AND ps_supplycost_cents = (
       |    SELECT MIN(ps2.ps_supplycost_cents) FROM partsupp ps2
       |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
       |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
       |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
       |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps.ps_suppkey
       |LIMIT 100""".stripMargin)

  // Q20 — potential part promotion: suppliers whose availqty exceeds half
  // their shipped quantity of promotable parts; quantity sums routed
  // through DECIMAL per the determinism contract.
  private val q20 = shared("q20_potential_promotion",
    s"""WITH $partsuppCte
       |SELECT s_name, s_suppkey FROM supplier
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE n_name = 'NATION_1' AND s_suppkey IN (
       |  SELECT ps_suppkey FROM partsupp
       |  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
       |    AND CAST(2 * ps_availqty AS DECIMAL(38,6)) > (
       |      SELECT SUM(CAST(l_quantity AS DECIMAL(38,6))) FROM lineitem
       |      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
       |ORDER BY s_name, s_suppkey""".stripMargin)

  // Q8 — national market share: needs NO partsupp, only columns the
  // testdata ships; the share is a division of two DECIMAL-routed sums
  // cast to DOUBLE (IEEE division of identical operands is bit-stable —
  // the temperatureMix precedent).
  private val q8 = shared("q8_market_share",
    """SELECT o_year,
      |  CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
      |                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
      |    / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS volume,
      |    n2.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA'
      |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                        AND TIMESTAMP '1997-12-31 00:00:00'
      |    AND p_type = 'PROMO'
      |) t GROUP BY o_year ORDER BY o_year""".stripMargin)

  val all: Seq[QueryDef] = Seq(q2, q4, q6, q7, q8, q9, q10, q11, q12, q13, q15, q16,
    q17, q18, q19, q20, q21, q22)
}
