DROP TABLE IF EXISTS golden_cust_parts2;
CREATE TABLE golden_cust_parts2 PARTITION BY COLUMN(c_nationkey INT4) AS SELECT c_custkey, c_name, c_nationkey FROM customer;
SELECT a.n_nationkey, a.n_name, b.c_custkey
FROM nation a LEFT OUTER JOIN golden_cust_parts2 b
  ON a.n_nationkey = b.c_nationkey AND b.c_custkey < 5
ORDER BY a.n_nationkey, b.c_custkey;
