SELECT s_suppkey, s_name FROM supplier
WHERE s_nationkey IN (
  SELECT nk FROM (SELECT n_nationkey AS nk, n_regionkey FROM nation) t WHERE n_regionkey = 1
)
ORDER BY s_suppkey;
