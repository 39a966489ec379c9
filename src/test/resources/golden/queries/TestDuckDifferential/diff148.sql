SELECT v, COUNT(*) AS cnt FROM (
  SELECT n_regionkey AS v FROM nation WHERE n_nationkey > 3
  UNION ALL SELECT r_regionkey AS v FROM region
  UNION ALL SELECT c_nationkey % 5 AS v FROM customer WHERE c_custkey < 40
) u WHERE v >= 1
GROUP BY v ORDER BY v NULLS FIRST;
