SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 2
UNION ALL
SELECT n_nationkey, n_name FROM nation WHERE n_nationkey BETWEEN 20 AND 22
ORDER BY 1 DESC;
