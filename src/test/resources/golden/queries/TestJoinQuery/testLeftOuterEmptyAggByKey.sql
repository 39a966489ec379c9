DROP TABLE IF EXISTS golden_empty_orders;
CREATE TABLE golden_empty_orders AS SELECT * FROM orders WHERE o_orderkey < 0;
SELECT c_custkey, sum(golden_empty_orders.o_orderkey) AS s, max(golden_empty_orders.o_orderstatus) AS st, max(golden_empty_orders.o_orderdate) AS d
FROM customer LEFT OUTER JOIN golden_empty_orders ON c_custkey = o_orderkey
WHERE c_custkey < 30
GROUP BY c_custkey
ORDER BY c_custkey;
