DROP TABLE IF EXISTS customer_pq_e;
CREATE TABLE customer_pq_e USING PARQUET AS
SELECT * FROM customer WHERE c_custkey < 50
UNION ALL
SELECT * FROM customer WHERE c_custkey > 999999;
DROP TABLE IF EXISTS nation_pq_e;
CREATE TABLE nation_pq_e USING PARQUET AS SELECT * FROM nation;
SELECT c_custkey, c_name, n_name
FROM customer_pq_e, nation_pq_e
WHERE c_nationkey = n_nationkey
ORDER BY c_custkey, c_name, n_name;
