SELECT r.r_regionkey, r.r_name, n.n_name
FROM nation n RIGHT OUTER JOIN region r
  ON n.n_regionkey = r.r_regionkey AND n.n_nationkey < 3
ORDER BY r.r_regionkey, n.n_name;
