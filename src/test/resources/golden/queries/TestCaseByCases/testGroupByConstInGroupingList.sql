SELECT l_orderkey, '##' AS col1
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_orderkey < 50
GROUP BY l_orderkey, col1
ORDER BY l_orderkey;
