SELECT k, cnt FROM (
  SELECT 1 AS k, count(*) AS cnt FROM region
  UNION ALL SELECT 2, count(*) FROM nation
  UNION ALL SELECT 3, count(*) FROM supplier
  UNION ALL SELECT 4, count(*) FROM region WHERE r_regionkey > 2
  UNION ALL SELECT 5, count(*) FROM nation WHERE n_regionkey = 0
  UNION ALL SELECT 6, count(*) FROM region WHERE r_regionkey < 0
  UNION ALL SELECT 7, count(*) FROM nation WHERE n_nationkey > 20
  UNION ALL SELECT 8, count(*) FROM supplier WHERE s_suppkey < 5
  UNION ALL SELECT 9, count(*) FROM region WHERE r_name LIKE 'A%'
  UNION ALL SELECT 10, count(*) FROM nation WHERE n_name LIKE '%_1%'
) t ORDER BY k;
