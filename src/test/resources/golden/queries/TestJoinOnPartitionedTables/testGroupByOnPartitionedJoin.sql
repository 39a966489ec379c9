DROP TABLE IF EXISTS pj_orders;
CREATE TABLE pj_orders (okey INT8, cust INT8) PARTITION BY COLUMN (status TEXT);
INSERT INTO pj_orders SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey < 300;
SELECT p.status, COUNT(*) AS cnt, MIN(c.c_name) AS first_cust
FROM pj_orders p JOIN customer c ON p.cust = c.c_custkey
GROUP BY p.status
ORDER BY p.status;
