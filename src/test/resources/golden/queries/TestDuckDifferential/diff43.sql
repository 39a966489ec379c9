SELECT c_custkey, c_nationkey FROM customer
WHERE c_custkey * 6 > (SELECT COUNT(*) FROM orders WHERE o_orderkey % 4 = 1)
ORDER BY c_custkey NULLS FIRST LIMIT 50;
