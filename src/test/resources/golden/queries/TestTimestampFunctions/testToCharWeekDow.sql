SELECT o_orderkey,
       TO_CHAR(o_orderdate, 'YYYY "week" WW') AS week_form,
       DATE_PART('dow', o_orderdate) AS dow
FROM orders
WHERE o_orderkey < 8
ORDER BY o_orderkey;
