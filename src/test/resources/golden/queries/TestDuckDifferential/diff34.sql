SELECT n_regionkey AS v FROM nation WHERE n_nationkey > 1
EXCEPT
SELECT r_regionkey AS v FROM region WHERE r_regionkey >= 3
ORDER BY v NULLS FIRST;
