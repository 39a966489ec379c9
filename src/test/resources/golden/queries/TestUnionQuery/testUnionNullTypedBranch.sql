SELECT n_name AS nm, CAST(NULL AS INT4) AS extra FROM nation WHERE n_nationkey < 2
UNION ALL
SELECT r_name, r_regionkey FROM region WHERE r_regionkey < 2
ORDER BY nm, extra NULLS FIRST;
