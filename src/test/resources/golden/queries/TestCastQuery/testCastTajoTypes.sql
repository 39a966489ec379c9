SELECT CAST(n_nationkey AS INT8) AS big,
  CAST(n_regionkey AS TEXT) AS s,
  CAST(CAST(n_nationkey AS FLOAT8) / 2 AS FLOAT4) AS f
FROM nation WHERE n_nationkey < 5 ORDER BY big;
