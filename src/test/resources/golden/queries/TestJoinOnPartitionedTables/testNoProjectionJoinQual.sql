DROP TABLE IF EXISTS golden_cust_parts_np;
CREATE TABLE golden_cust_parts_np PARTITION BY COLUMN(c_nationkey INT4) AS SELECT c_custkey, c_name, c_nationkey FROM customer;
SELECT count(*) AS cnt FROM golden_cust_parts_np t1, golden_cust_parts_np t2 WHERE t1.c_nationkey = t2.c_nationkey;
