SELECT n_nationkey,
  rank() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rnk,
  sum(n_nationkey) OVER (ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
FROM nation ORDER BY n_nationkey LIMIT 12;
