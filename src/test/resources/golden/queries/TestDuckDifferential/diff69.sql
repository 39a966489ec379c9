SELECT o_orderkey % 4 AS g, MIN(o_orderstatus) AS lo, MAX(o_orderstatus) AS hi, SUM(LENGTH(o_orderstatus)) AS lensum
FROM orders WHERE o_orderstatus LIKE '%u%'
GROUP BY o_orderkey % 4 ORDER BY g NULLS FIRST;
