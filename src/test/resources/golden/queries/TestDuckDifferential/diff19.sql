SELECT c_custkey, c_nationkey FROM customer
WHERE c_custkey * 5 > (SELECT COUNT(*) FROM orders WHERE o_orderkey BETWEEN 431 AND 530)
ORDER BY c_custkey NULLS FIRST LIMIT 50;
