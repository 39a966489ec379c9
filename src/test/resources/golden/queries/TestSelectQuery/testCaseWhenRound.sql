SELECT n_nationkey,
       CASE WHEN n_regionkey > 0 THEN ROUND(CAST(n_nationkey AS FLOAT8) / n_regionkey, 2) ELSE -1.0 END AS ratio
FROM nation
WHERE n_nationkey < 12
ORDER BY n_nationkey;
