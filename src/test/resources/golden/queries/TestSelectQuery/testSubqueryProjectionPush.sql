SELECT x FROM (
  SELECT n_name AS x, n_regionkey FROM nation
) t WHERE n_regionkey = 1 ORDER BY x;
