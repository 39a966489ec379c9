SELECT x FROM (
  SELECT n_nationkey AS x FROM nation
  UNION ALL
  SELECT n_nationkey AS x FROM nation
) t ORDER BY x LIMIT 7;
