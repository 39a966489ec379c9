SELECT n_nationkey, n_name, n_regionkey, t.cnt
FROM nation n
JOIN (
  SELECT r_regionkey, count(*) AS cnt
  FROM nation n JOIN region r ON (n.n_regionkey = r.r_regionkey)
  GROUP BY r_regionkey
) t ON (n.n_regionkey = t.r_regionkey) AND n.n_nationkey > t.cnt
ORDER BY n_nationkey;
