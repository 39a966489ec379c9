SELECT n_nationkey, REGEXP_REPLACE(n_name, '_', ' ') AS spaced,
  LENGTH(n_name) AS len, STRPOS(n_name, 'N') AS npos
FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey;
