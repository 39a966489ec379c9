SELECT n_regionkey AS v FROM nation WHERE n_nationkey > 3
INTERSECT
SELECT r_regionkey AS v FROM region WHERE r_regionkey >= 3
ORDER BY v NULLS FIRST;
