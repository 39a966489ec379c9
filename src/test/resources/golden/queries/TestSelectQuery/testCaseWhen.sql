SELECT o_orderkey,
  CASE WHEN o_totalprice > 200000 THEN 'big'
       WHEN o_totalprice > 100000 THEN 'mid'
       ELSE 'small' END AS bucket
FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey;
