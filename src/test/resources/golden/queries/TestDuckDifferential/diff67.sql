SELECT c_custkey, c_nationkey FROM customer
WHERE c_custkey * 3 > (SELECT COUNT(*) FROM orders WHERE o_orderkey % 6 = 1)
ORDER BY c_custkey NULLS FIRST LIMIT 50;
