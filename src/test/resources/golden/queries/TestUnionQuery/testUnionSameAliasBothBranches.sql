SELECT UPPER(r_name) AS val FROM region WHERE r_regionkey < 2
UNION ALL
SELECT LOWER(n_name) AS val FROM nation WHERE n_nationkey < 3
ORDER BY val;
