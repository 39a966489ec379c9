SELECT (l_orderkey + l_orderkey) l_orderkey
FROM lineitem WHERE l_orderkey > 2
ORDER BY l_orderkey
LIMIT 10;
