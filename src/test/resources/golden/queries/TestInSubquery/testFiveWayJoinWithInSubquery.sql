SELECT n_regionkey, count(*) AS cnt
FROM customer, lineitem, orders, supplier, nation
WHERE l_orderkey = o_orderkey AND c_custkey = o_custkey AND l_linenumber = s_suppkey
  AND l_partkey IN (SELECT l_partkey FROM lineitem WHERE l_linenumber IN (1, 3, 5, 7, 9))
  AND n_nationkey = c_nationkey
GROUP BY n_regionkey
ORDER BY n_regionkey
LIMIT 100;
