SELECT t.n_name, t.rnk, r.r_name FROM (
  SELECT n_name, n_regionkey, rank() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rnk FROM nation
) t JOIN region r ON t.n_regionkey = r.r_regionkey
WHERE t.rnk = 1 ORDER BY t.n_name;
