DROP TABLE IF EXISTS ctas_l1;
CREATE TABLE ctas_l1 AS SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 5;
SELECT l_orderkey, l_linenumber, l_quantity FROM ctas_l1 ORDER BY l_orderkey, l_linenumber;
