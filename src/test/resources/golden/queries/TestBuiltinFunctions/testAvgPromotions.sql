SELECT AVG(CAST(n_nationkey AS INT4)) AS avg_int4,
       AVG(CAST(n_nationkey AS INT8)) AS avg_int8,
       AVG(CAST(n_nationkey AS FLOAT8)) AS avg_f8
FROM nation;
