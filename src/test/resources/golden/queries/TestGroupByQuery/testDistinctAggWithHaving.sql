SELECT l_linenumber, COUNT(*) AS cnt,
  COUNT(DISTINCT l_orderkey) AS distinct_orders,
  SUM(DISTINCT l_orderkey) AS sum_distinct
FROM lineitem
GROUP BY l_linenumber
HAVING COUNT(DISTINCT l_orderkey) > 1000
ORDER BY l_linenumber;
