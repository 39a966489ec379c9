DROP TABLE IF EXISTS cbc_t3;
CREATE TABLE cbc_t3 (okey INT8, col1 TEXT);
INSERT OVERWRITE INTO cbc_t3
SELECT l_orderkey, '##' AS col1
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_orderkey < 12
GROUP BY l_orderkey, col1
ORDER BY l_orderkey;
SELECT okey, col1 FROM cbc_t3 ORDER BY okey;
