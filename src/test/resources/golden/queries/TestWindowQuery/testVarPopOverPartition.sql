SELECT n_regionkey, n_nationkey,
       ROUND(VAR_POP(CAST(n_nationkey AS FLOAT8)) OVER (PARTITION BY n_regionkey), 4) AS key_var,
       ROUND(STDDEV_SAMP(CAST(n_nationkey AS FLOAT8)) OVER (PARTITION BY n_regionkey), 4) AS key_sd
FROM nation
WHERE n_nationkey < 15
ORDER BY n_regionkey, n_nationkey;
