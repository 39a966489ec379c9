SELECT o_orderkey, o_orderstatus,
  ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn,
  RANK() OVER (ORDER BY o_orderkey % 3, o_orderkey) AS rk
FROM orders WHERE o_orderkey > 897
ORDER BY o_orderkey NULLS FIRST LIMIT 60;
