SELECT n_name AS nm, n_nationkey AS k FROM nation WHERE n_nationkey < 5
UNION ALL
SELECT n_name, n_nationkey FROM nation WHERE n_nationkey >= 20
ORDER BY k DESC
LIMIT 4;
