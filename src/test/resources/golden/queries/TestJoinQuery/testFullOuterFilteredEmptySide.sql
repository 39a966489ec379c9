SELECT r.r_regionkey, r.r_name, e.r_name AS empty_name
FROM region r FULL OUTER JOIN (
  SELECT r_regionkey, r_name FROM region WHERE r_regionkey > 99
) e ON r.r_regionkey = e.r_regionkey
ORDER BY r.r_regionkey;
