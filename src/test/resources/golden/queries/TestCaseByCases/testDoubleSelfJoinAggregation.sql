SELECT l.l_orderkey, '##' AS col1, SUM(CAST(l.l_orderkey AS INT8)) AS s1
FROM lineitem l
  JOIN orders o1 ON l.l_orderkey = o1.o_orderkey
  JOIN orders o2 ON l.l_orderkey = o2.o_orderkey
WHERE l.l_orderkey < 10
GROUP BY l.l_orderkey, col1
ORDER BY l.l_orderkey;
