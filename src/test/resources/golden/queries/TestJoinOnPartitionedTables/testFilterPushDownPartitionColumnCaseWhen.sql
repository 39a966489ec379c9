DROP TABLE IF EXISTS golden_cust_parts_cw;
CREATE TABLE golden_cust_parts_cw PARTITION BY COLUMN(c_nationkey INT4) AS SELECT c_custkey, c_name, c_nationkey FROM customer;
SELECT c_custkey, c_nationkey, c_name, o_custkey, (CASE WHEN a.c_nationkey > 3 THEN 4 ELSE 3 END) AS cw
FROM golden_cust_parts_cw a
INNER JOIN orders b ON a.c_custkey = b.o_custkey
WHERE a.c_custkey = (CASE WHEN a.c_name LIKE 'Customer%' AND a.c_nationkey > 3 THEN 4 ELSE 3 END)
ORDER BY c_custkey, o_custkey
LIMIT 20;
