SELECT n_nationkey, div(CAST(n_nationkey AS BIGINT), 4) AS quot,
  n_nationkey % 4 AS rem, ABS(n_nationkey - 12) AS dist
FROM nation ORDER BY n_nationkey;
