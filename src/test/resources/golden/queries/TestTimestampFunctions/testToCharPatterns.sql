SELECT o_orderkey,
  to_char(o_orderdate, 'YYYY-MM-DD') AS d,
  to_char(o_orderdate, 'Mon DD, YYYY') AS pretty,
  to_char(o_orderdate, 'HH24:MI:SS TZ') AS hms
FROM orders WHERE o_orderkey < 6 ORDER BY o_orderkey;
