SELECT ROUND(CORR(CAST(n_nationkey AS FLOAT8), CAST(n_regionkey AS FLOAT8)), 6) AS key_corr,
       ROUND(COVAR_POP(CAST(n_nationkey AS FLOAT8), CAST(n_regionkey AS FLOAT8)), 6) AS cov_p,
       ROUND(COVAR_SAMP(CAST(n_nationkey AS FLOAT8), CAST(n_regionkey AS FLOAT8)), 6) AS cov_s
FROM nation;
