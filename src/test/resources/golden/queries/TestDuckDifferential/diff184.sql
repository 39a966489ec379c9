SELECT c_custkey % 50 AS v FROM customer WHERE c_custkey > 35
INTERSECT
SELECT o_custkey % 50 AS v FROM orders WHERE o_orderkey % 5 = 0
ORDER BY v NULLS FIRST;
