SELECT n_nationkey, n_name,
       CASE WHEN n_regionkey IN (1, CAST(NULL AS INT4)) THEN 'in' ELSE 'not-in-or-unknown' END AS verdict
FROM nation
WHERE n_nationkey < 6
ORDER BY n_nationkey;
