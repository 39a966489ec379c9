SELECT SUM(doubled) AS total FROM (
  SELECT n_nationkey * 2 AS doubled FROM nation WHERE n_regionkey = 1
) t;
