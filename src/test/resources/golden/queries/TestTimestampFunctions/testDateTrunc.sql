SELECT o_orderkey, CAST(DATE_TRUNC('MONTH', o_orderdate) AS STRING) AS month_start
FROM orders WHERE o_orderkey < 6 ORDER BY o_orderkey;
