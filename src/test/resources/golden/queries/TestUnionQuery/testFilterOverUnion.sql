SELECT grp, total FROM (
  SELECT n_regionkey AS grp, COUNT(*) AS total FROM nation GROUP BY n_regionkey
  UNION
  SELECT n_regionkey AS grp, COUNT(*) AS total FROM nation GROUP BY n_regionkey
) t WHERE total > 4 ORDER BY grp;
