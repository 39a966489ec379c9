DROP TABLE IF EXISTS golden_cust_parts_gb;
CREATE TABLE golden_cust_parts_gb PARTITION BY COLUMN(c_nationkey INT4) AS SELECT c_custkey, c_name, c_nationkey FROM customer;
SELECT upper(c_name) AS c_name, count(1) AS cnt
FROM golden_cust_parts_gb
WHERE c_name IS NOT NULL AND c_nationkey = 1
GROUP BY c_name
ORDER BY c_name;
