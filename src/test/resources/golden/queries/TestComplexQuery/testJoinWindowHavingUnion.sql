SELECT src, k, ranked FROM (
  SELECT 'big' AS src, n.n_regionkey AS k,
         RANK() OVER (ORDER BY COUNT(*) DESC, n.n_regionkey) AS ranked
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY n.n_regionkey
  HAVING COUNT(*) >= 5
) a
UNION ALL
SELECT 'small' AS src, r_regionkey, CAST(1 AS INT4) FROM region WHERE r_regionkey = 99
ORDER BY src, ranked, k;
