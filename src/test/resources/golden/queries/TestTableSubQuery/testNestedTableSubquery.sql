SELECT mx FROM (
  SELECT MAX(v) AS mx FROM (
    SELECT n_nationkey AS v FROM nation WHERE n_regionkey = 1
  ) inner_t
) outer_t;
