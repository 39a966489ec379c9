SELECT r_name AS name FROM region
UNION ALL
SELECT n_name FROM nation WHERE n_regionkey = 0
ORDER BY name;
