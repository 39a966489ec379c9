SELECT o_orderkey, o_orderstatus,
  RANK() OVER (ORDER BY o_orderstatus) AS rnk,
  DENSE_RANK() OVER (ORDER BY o_orderstatus) AS drnk
FROM orders WHERE o_orderkey < 20 ORDER BY o_orderstatus, o_orderkey;
