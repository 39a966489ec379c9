DROP TABLE IF EXISTS golden_empty_orders3;
CREATE TABLE golden_empty_orders3 AS SELECT * FROM orders WHERE o_orderkey < 0;
SELECT l_linenumber, sum(golden_empty_orders3.o_orderkey) AS s1, max(golden_empty_orders3.o_orderstatus) AS s2,
       avg(l_quantity) AS a1, sum(l_quantity) AS s3
FROM lineitem LEFT OUTER JOIN golden_empty_orders3 ON l_orderkey = o_orderkey
GROUP BY l_linenumber
ORDER BY l_linenumber;
