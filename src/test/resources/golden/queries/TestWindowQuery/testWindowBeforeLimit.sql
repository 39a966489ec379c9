SELECT r_name, rank() OVER (ORDER BY r_regionkey) AS ran FROM region LIMIT 3;
