SELECT tag, SUM(val) AS total FROM (
  SELECT 'region' AS tag, CAST(r_regionkey AS INT8) AS val FROM region
  UNION ALL
  SELECT 'nation' AS tag, CAST(n_nationkey AS INT8) AS val FROM nation
) u
GROUP BY tag
ORDER BY tag;
