SELECT r.r_regionkey,
       COALESCE(n.n_name, s.s_name, 'fallback') AS first_present
FROM region r
LEFT OUTER JOIN (SELECT * FROM nation WHERE n_nationkey < 2) n ON r.r_regionkey = n.n_regionkey
LEFT OUTER JOIN (SELECT * FROM supplier WHERE s_suppkey < 3) s ON r.r_regionkey = CAST(s.s_suppkey AS INT4)
ORDER BY r.r_regionkey;
