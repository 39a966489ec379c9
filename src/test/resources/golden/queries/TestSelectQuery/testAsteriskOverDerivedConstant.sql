SELECT * FROM (SELECT l_orderkey, 1 FROM lineitem WHERE l_orderkey % 2 = 0) t1
ORDER BY l_orderkey LIMIT 10;
