SELECT n_nationkey AS text, CAST(n_nationkey AS TEXT) AS casted
FROM nation WHERE n_nationkey < 3 ORDER BY text;
