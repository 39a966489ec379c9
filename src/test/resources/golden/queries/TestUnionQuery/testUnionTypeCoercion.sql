SELECT CAST(n_nationkey AS INT4) AS v FROM nation WHERE n_nationkey < 3
UNION ALL
SELECT CAST(c_acctbal AS FLOAT8) FROM customer WHERE c_custkey = 1
ORDER BY v;
