SELECT NULLIF(n_regionkey, 1) AS rk, n_nationkey
FROM nation
WHERE n_nationkey < 8
ORDER BY rk, n_nationkey;
