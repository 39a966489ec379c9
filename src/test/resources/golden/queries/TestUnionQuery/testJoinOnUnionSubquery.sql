SELECT u.k, r.r_name FROM (
  SELECT r_regionkey AS k FROM region WHERE r_regionkey < 2
  UNION ALL
  SELECT r_regionkey FROM region WHERE r_regionkey >= 3
) u JOIN region r ON u.k = r.r_regionkey
ORDER BY u.k;
