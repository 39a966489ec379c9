DROP TABLE IF EXISTS golden_cust_parts_nd;
CREATE TABLE golden_cust_parts_nd PARTITION BY COLUMN(c_nationkey INT4) AS SELECT c_custkey, c_name, c_nationkey FROM customer;
SELECT a.n_nationkey, a.n_name, b.c_custkey, b.c_nationkey, b.c_name
FROM nation a
LEFT OUTER JOIN golden_cust_parts_nd b ON a.n_nationkey = b.c_custkey AND b.c_nationkey = 100
ORDER BY a.n_nationkey;
