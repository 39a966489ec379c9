SELECT o_orderpriority, o_custkey % 4 AS b, COUNT(*) AS cnt, SUM(o_orderkey) AS s
FROM orders WHERE o_orderkey > 362
GROUP BY ROLLUP (o_orderpriority, o_custkey % 4)
ORDER BY o_orderpriority NULLS FIRST, b NULLS FIRST, cnt NULLS FIRST;
