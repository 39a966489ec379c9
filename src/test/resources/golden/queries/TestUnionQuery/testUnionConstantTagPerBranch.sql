SELECT l_orderkey, l_partkey, query FROM (
  SELECT l_orderkey, l_partkey, 'abc' AS query FROM lineitem WHERE l_orderkey = 1
  UNION ALL
  SELECT l_orderkey, l_partkey, 'bbc' AS query FROM lineitem WHERE l_orderkey = 1
) result
ORDER BY query, l_partkey;
