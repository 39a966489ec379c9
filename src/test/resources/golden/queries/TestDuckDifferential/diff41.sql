SELECT a.bucket, a.cnt, a.total FROM (
  SELECT o_custkey % 2 AS bucket, COUNT(*) AS cnt, SUM(o_orderkey) AS total
  FROM orders WHERE o_orderkey IN (346, 349, 363)
  GROUP BY o_custkey % 2
) a WHERE a.cnt > 4
ORDER BY a.bucket NULLS FIRST;
