SELECT r.r_regionkey,
       n.n_name,
       s.s_name
FROM region r
LEFT OUTER JOIN (SELECT * FROM nation WHERE n_nationkey < 5) n ON r.r_regionkey = n.n_regionkey
LEFT OUTER JOIN (SELECT * FROM supplier WHERE s_suppkey < 5) s ON n.n_nationkey = s.s_nationkey
ORDER BY r.r_regionkey, n.n_name, s.s_name;
