SELECT half, COUNT(*) AS bucket_size FROM (
  SELECT NTILE(4) OVER (ORDER BY n_nationkey) AS half FROM nation
) t
GROUP BY half
ORDER BY half;
