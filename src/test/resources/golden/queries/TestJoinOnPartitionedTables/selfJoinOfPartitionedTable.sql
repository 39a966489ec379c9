DROP TABLE IF EXISTS golden_cust_parts_self;
CREATE TABLE golden_cust_parts_self PARTITION BY COLUMN(c_nationkey INT4) AS SELECT c_custkey, c_name, c_nationkey FROM customer;
SELECT a.c_nationkey, COUNT(*) AS pairs
FROM golden_cust_parts_self a JOIN golden_cust_parts_self b ON a.c_nationkey = b.c_nationkey
GROUP BY a.c_nationkey
ORDER BY a.c_nationkey;
