SELECT r_regionkey, r_name FROM region
UNION
SELECT r_regionkey, r_name FROM region
ORDER BY r_regionkey;
