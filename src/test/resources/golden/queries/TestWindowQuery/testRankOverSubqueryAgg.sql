SELECT r_name, c, rank() OVER (PARTITION BY r_regionkey ORDER BY r_regionkey) AS ran FROM (
  SELECT r_name, r_regionkey, COUNT(*) AS c FROM region GROUP BY r_name, r_regionkey
) a ORDER BY r_name LIMIT 3;
