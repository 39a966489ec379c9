SELECT c_custkey, c_nationkey FROM customer
WHERE c_custkey * 7 > (SELECT COUNT(*) FROM orders WHERE o_orderkey > 884)
ORDER BY c_custkey NULLS FIRST LIMIT 50;
