SELECT n.n_regionkey, COUNT(*) AS cnt FROM (
  SELECT * FROM nation WHERE n_nationkey > 2
) n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_regionkey ORDER BY n.n_regionkey;
