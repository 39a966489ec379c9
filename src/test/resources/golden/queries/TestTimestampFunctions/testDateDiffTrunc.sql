SELECT o_orderkey,
       DATEDIFF(CAST('2022-01-01' AS DATE), CAST(o_orderdate AS DATE)) AS days_to_2022,
       CAST(DATE_TRUNC('MONTH', o_orderdate) AS TEXT) AS month_start,
       CAST(DATE_TRUNC('YEAR', o_orderdate) AS TEXT) AS year_start
FROM orders
WHERE o_orderkey < 6
ORDER BY o_orderkey;
