SELECT n_nationkey,
       n_nationkey + 0.5 AS plus_half,
       n_nationkey * 2.0 AS doubled,
       n_nationkey / 4 AS int_over_int,
       CAST(n_nationkey AS FLOAT8) / 4 AS float_over_int
FROM nation
WHERE n_nationkey < 6
ORDER BY n_nationkey;
