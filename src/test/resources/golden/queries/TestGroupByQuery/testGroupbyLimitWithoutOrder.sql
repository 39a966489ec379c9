SELECT cnt FROM (
  SELECT n_regionkey, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey
) t
ORDER BY cnt
LIMIT 3;
