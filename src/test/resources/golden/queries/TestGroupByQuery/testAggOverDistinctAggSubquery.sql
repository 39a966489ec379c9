SELECT SUM(cnt1) AS total_distinct_prios, SUM(sum2) AS total_price_sum FROM (
  SELECT o_orderdate,
         COUNT(DISTINCT o_orderpriority) AS cnt1,
         SUM(CAST(o_totalprice AS INT8)) AS sum2
  FROM orders
  GROUP BY o_orderdate
) a;
