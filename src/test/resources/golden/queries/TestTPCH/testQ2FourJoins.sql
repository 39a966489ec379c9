DROP TABLE IF EXISTS partsupp_g;
CREATE TABLE partsupp_g AS
SELECT p_partkey AS ps_partkey, s_suppkey AS ps_suppkey,
       CAST((p_partkey * 7 + s_suppkey * 13) % 1000 AS FLOAT8) / 10 AS ps_supplycost
FROM part, supplier WHERE (p_partkey + s_suppkey) % 4 = 0;
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost, r_name, p_type, p_size
FROM region JOIN nation ON n_regionkey = r_regionkey AND r_name = 'AMERICA'
  JOIN supplier ON s_nationkey = n_nationkey
  JOIN partsupp_g ON s_suppkey = ps_suppkey
  JOIN part ON p_partkey = ps_partkey AND p_type LIKE '%DARD'
ORDER BY s_name, p_partkey LIMIT 30;
