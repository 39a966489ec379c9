SELECT a.bucket, a.cnt, a.total FROM (
  SELECT o_custkey % 6 AS bucket, COUNT(*) AS cnt, SUM(o_orderkey) AS total
  FROM orders WHERE o_orderkey % 4 = 1
  GROUP BY o_custkey % 6
) a WHERE a.cnt > 1
ORDER BY a.bucket NULLS FIRST;
