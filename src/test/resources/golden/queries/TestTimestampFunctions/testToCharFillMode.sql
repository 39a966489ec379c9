SELECT o_orderkey,
       TO_CHAR(o_orderdate, 'FMMM/FMDD/YYYY') AS us_short,
       TO_CHAR(o_orderdate, 'MM/DD/YYYY') AS us_padded
FROM orders
WHERE o_orderkey < 6
ORDER BY o_orderkey;
