DROP TABLE IF EXISTS golden_cust_parts;
CREATE TABLE golden_cust_parts PARTITION BY COLUMN(c_nationkey INT4) AS SELECT c_custkey, c_name, c_nationkey FROM customer;
SELECT c_custkey, c_name, n_nationkey
FROM golden_cust_parts, nation
WHERE c_nationkey = n_nationkey
ORDER BY c_custkey
LIMIT 20;
