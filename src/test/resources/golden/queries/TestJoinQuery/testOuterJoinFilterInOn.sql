SELECT r_name, r_regionkey, n_name
FROM region LEFT OUTER JOIN nation ON n_regionkey = r_regionkey AND r_name IN ('REGION_1', 'REGION_2')
ORDER BY r_name, n_name;
