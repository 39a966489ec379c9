-- reference: TestSQLAnalyzer/positive/join_9.sql — a TPC-H Q2-shaped join
-- chain with constant and LIKE predicates inside the ON clauses
-- (re-authored onto the columns this testdata ships; the reference's
-- partsupp columns are absent)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM region JOIN nation ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN supplier ON s_nationkey = n_nationkey
  JOIN part ON p_partkey = s_suppkey AND p_type LIKE '%ECO%' AND p_size < 30
ORDER BY s_acctbal DESC, s_name, p_partkey;
