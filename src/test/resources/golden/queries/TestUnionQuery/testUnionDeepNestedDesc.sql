SELECT * FROM (
  SELECT n_nationkey, n_name FROM (
    SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0
    UNION
    SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0
  ) t1 GROUP BY n_nationkey, n_name
  UNION
  SELECT n_nationkey, n_name FROM (
    SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1
    UNION
    SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0
  ) t2 GROUP BY n_nationkey, n_name
) t3 ORDER BY n_nationkey DESC, n_name DESC;
