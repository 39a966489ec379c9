SELECT l_orderkey, '##' AS col1, sum(l_orderkey) AS s1
FROM lineitem JOIN orders o1 ON l_orderkey = o1.o_orderkey JOIN orders o2 ON l_orderkey = o2.o_orderkey
WHERE l_orderkey < 50
GROUP BY l_orderkey, col1
ORDER BY l_orderkey;
