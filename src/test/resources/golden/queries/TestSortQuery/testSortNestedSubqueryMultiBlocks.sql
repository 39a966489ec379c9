SELECT l_orderkey, revenue FROM (
  SELECT l_orderkey, revenue FROM (
    SELECT l_orderkey, sum(l_extendedprice * l_discount) AS revenue FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey
  ) l1
) l2 ORDER BY l_orderkey;
