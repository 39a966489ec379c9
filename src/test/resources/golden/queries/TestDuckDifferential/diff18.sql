SELECT EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS p, COUNT(*) AS cnt, MIN(o_orderkey) AS lo
FROM orders WHERE o_orderkey % 4 = 1
GROUP BY EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) ORDER BY p NULLS FIRST;
