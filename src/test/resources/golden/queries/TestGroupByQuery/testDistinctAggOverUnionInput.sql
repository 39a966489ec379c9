SELECT src, COUNT(DISTINCT k) AS d_keys FROM (
  SELECT 'a' AS src, n_regionkey AS k FROM nation
  UNION ALL
  SELECT 'b' AS src, r_regionkey AS k FROM region
) u
GROUP BY src
ORDER BY src;
