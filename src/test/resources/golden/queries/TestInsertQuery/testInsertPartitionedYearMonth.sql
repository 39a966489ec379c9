DROP TABLE IF EXISTS ins_ym;
CREATE TABLE ins_ym (okey INT8, price FLOAT8) PARTITION BY COLUMN (yr TEXT, mon TEXT);
INSERT INTO ins_ym SELECT o_orderkey, o_totalprice, SUBSTR(CAST(o_orderdate AS TEXT), 1, 4), SUBSTR(CAST(o_orderdate AS TEXT), 6, 2) FROM orders WHERE o_orderkey < 100;
SELECT yr, mon, COUNT(*) AS cnt FROM ins_ym GROUP BY yr, mon ORDER BY yr, mon;
