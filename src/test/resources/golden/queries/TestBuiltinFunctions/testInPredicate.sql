SELECT r_name, r_regionkey IN (1, 3) AS picked FROM region ORDER BY r_name;
