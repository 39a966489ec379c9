SELECT c_custkey % 50 AS v FROM customer WHERE c_custkey > 58
INTERSECT
SELECT o_custkey % 50 AS v FROM orders WHERE o_orderkey % 4 = 0
ORDER BY v NULLS FIRST;
