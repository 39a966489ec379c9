SELECT n_regionkey AS v FROM nation WHERE n_nationkey > 9
UNION
SELECT r_regionkey AS v FROM region WHERE r_regionkey >= 1
ORDER BY v NULLS FIRST;
