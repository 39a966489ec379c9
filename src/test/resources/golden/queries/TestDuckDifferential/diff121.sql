SELECT COALESCE(n.n_regionkey, -1) AS nk, COALESCE(r.r_regionkey, -1) AS rk, n.n_name, r.r_name
FROM (SELECT * FROM nation WHERE n_nationkey > 5) n
FULL OUTER JOIN (SELECT * FROM region WHERE r_regionkey >= 2) r
ON n.n_regionkey = r.r_regionkey
ORDER BY nk NULLS FIRST, rk NULLS FIRST, n.n_name NULLS FIRST, r.r_name NULLS FIRST;
