SELECT v, COUNT(*) AS cnt FROM (
  SELECT n_regionkey AS v FROM nation WHERE n_nationkey > 5
  UNION ALL SELECT r_regionkey AS v FROM region
  UNION ALL SELECT c_nationkey % 5 AS v FROM customer WHERE c_custkey < 110
) u WHERE v >= 0
GROUP BY v ORDER BY v NULLS FIRST;
