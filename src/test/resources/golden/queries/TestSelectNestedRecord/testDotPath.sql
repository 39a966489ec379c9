SELECT r.first_name, r.last_name FROM (
  SELECT named_struct('first_name', n_name, 'last_name', CAST(n_nationkey AS TEXT)) AS r
  FROM nation WHERE n_regionkey = 0
) t ORDER BY r.first_name;
