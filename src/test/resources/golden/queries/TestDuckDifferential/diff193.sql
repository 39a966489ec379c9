SELECT c_nationkey AS v FROM customer WHERE c_custkey < 100
EXCEPT
SELECT n_nationkey AS v FROM nation WHERE n_nationkey > 13
ORDER BY v NULLS FIRST;
