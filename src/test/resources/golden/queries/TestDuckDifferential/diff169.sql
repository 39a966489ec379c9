SELECT c_nationkey AS v FROM customer WHERE c_custkey < 80
EXCEPT
SELECT n_nationkey AS v FROM nation WHERE n_nationkey % 4 = 1
ORDER BY v NULLS FIRST;
