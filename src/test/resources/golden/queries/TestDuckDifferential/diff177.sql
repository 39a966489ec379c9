SELECT c_nationkey AS v FROM customer WHERE c_custkey < 48
EXCEPT
SELECT n_nationkey AS v FROM nation WHERE n_nationkey > 6
ORDER BY v NULLS FIRST;
