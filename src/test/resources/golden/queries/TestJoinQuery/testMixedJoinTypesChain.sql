SELECT r.r_name, n.n_name, s.s_name
FROM region r
  INNER JOIN nation n ON n.n_regionkey = r.r_regionkey
  LEFT OUTER JOIN supplier s ON s.s_nationkey = n.n_nationkey
ORDER BY r.r_name, n.n_name, s.s_name LIMIT 40;
