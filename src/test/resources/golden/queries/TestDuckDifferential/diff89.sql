SELECT a.bucket, a.cnt, a.total FROM (
  SELECT o_custkey % 4 AS bucket, COUNT(*) AS cnt, SUM(o_orderkey) AS total
  FROM orders WHERE o_orderkey BETWEEN 113 AND 272
  GROUP BY o_custkey % 4
) a WHERE a.cnt > 4
ORDER BY a.bucket NULLS FIRST;
