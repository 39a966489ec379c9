SELECT r_name,
  (SELECT COUNT(*) FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS n_nations
FROM region r ORDER BY r_name;
