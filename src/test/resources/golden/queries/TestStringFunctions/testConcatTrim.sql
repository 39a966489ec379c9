SELECT n_nationkey, CONCAT(n_name, '-', CAST(n_regionkey AS TEXT)) AS tagged,
  TRIM('  padded  ') AS trimmed, LTRIM('  x') AS l, RTRIM('x  ') AS r
FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey;
