WITH region_counts AS (
  SELECT n_regionkey, COUNT(*) AS nations FROM nation GROUP BY n_regionkey
), big_regions AS (
  SELECT n_regionkey FROM region_counts WHERE nations >= 5
)
SELECT r.r_name, rc.nations
FROM big_regions b
JOIN region r ON b.n_regionkey = r.r_regionkey
JOIN region_counts rc ON rc.n_regionkey = b.n_regionkey
ORDER BY r.r_name;
