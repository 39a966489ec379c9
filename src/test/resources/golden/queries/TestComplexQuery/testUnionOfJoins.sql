SELECT kind, name, k FROM (
  SELECT 'region-nation' AS kind, r_name AS name, CAST(n_nationkey AS BIGINT) AS k
  FROM region JOIN nation ON r_regionkey = n_regionkey WHERE n_nationkey < 3
  UNION ALL
  SELECT 'nation-customer' AS kind, n_name AS name, CAST(c_custkey AS BIGINT) AS k
  FROM nation JOIN customer ON n_nationkey = c_nationkey WHERE c_custkey < 4
) u ORDER BY kind, name, k;
