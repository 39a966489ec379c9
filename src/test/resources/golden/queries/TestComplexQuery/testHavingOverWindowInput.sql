SELECT o_orderstatus, COUNT(*) AS n_top FROM (
  SELECT o_orderstatus,
    RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS r
  FROM orders
) t WHERE r <= 10
GROUP BY o_orderstatus HAVING COUNT(*) >= 10
ORDER BY o_orderstatus;
