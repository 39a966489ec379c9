SELECT k, COUNT(*) AS cnt FROM (
  SELECT n_regionkey AS k FROM nation
  UNION ALL
  SELECT r_regionkey AS k FROM region
) t GROUP BY k ORDER BY k;
