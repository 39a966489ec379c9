SELECT n_regionkey AS v FROM nation WHERE n_nationkey > 12
INTERSECT
SELECT r_regionkey AS v FROM region WHERE r_regionkey >= 1
ORDER BY v NULLS FIRST;
