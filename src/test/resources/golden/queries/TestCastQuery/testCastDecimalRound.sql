SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,1)) AS p1,
  CAST(o_totalprice AS INT8) AS pint
FROM orders WHERE o_orderkey < 6 ORDER BY o_orderkey;
