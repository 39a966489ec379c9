DROP TABLE IF EXISTS golden_t3;
CREATE TABLE golden_t3 (col1 INT8, col2 TEXT);
INSERT OVERWRITE INTO golden_t3
  SELECT l_orderkey, '##' AS col1
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_orderkey < 50
  GROUP BY l_orderkey, col1
  ORDER BY l_orderkey;
SELECT col1, col2 FROM golden_t3 ORDER BY col1;
