SELECT ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
       o_orderkey
FROM orders
WHERE o_orderkey < 50
ORDER BY rnk;
