SELECT c_custkey, c_nationkey FROM customer
WHERE c_custkey * 8 > (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 1055)
ORDER BY c_custkey NULLS FIRST LIMIT 50;
