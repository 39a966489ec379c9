DROP TABLE IF EXISTS golden_empty_orders2;
CREATE TABLE golden_empty_orders2 AS SELECT * FROM orders WHERE o_orderkey < 0;
SELECT max(c_custkey) AS m1, sum(orders.o_orderkey) AS m2, max(orders.o_orderstatus) AS m3, max(orders.o_orderdate) AS m4
FROM customer LEFT OUTER JOIN orders ON c_custkey = o_orderkey
UNION ALL
SELECT max(c_custkey), sum(golden_empty_orders2.o_orderkey), max(golden_empty_orders2.o_orderstatus), max(golden_empty_orders2.o_orderdate)
FROM customer LEFT OUTER JOIN golden_empty_orders2 ON c_custkey = o_orderkey
ORDER BY m1, m2;
