SELECT c_nationkey AS v FROM customer WHERE c_custkey < 121
EXCEPT
SELECT n_nationkey AS v FROM nation WHERE n_nationkey BETWEEN 4 AND 8
ORDER BY v NULLS FIRST;
