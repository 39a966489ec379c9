SELECT n.n_nationkey, r.r_name
FROM nation n JOIN region r
  ON n.n_regionkey = r.r_regionkey OR (n.n_regionkey IS NULL AND r.r_regionkey IS NULL)
WHERE n.n_nationkey < 5
ORDER BY n.n_nationkey;
