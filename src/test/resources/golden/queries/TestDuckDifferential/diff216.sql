SELECT CAST(CAST(o_orderdate AS DATE) + INTERVAL '81' DAY AS DATE) AS shifted,
  COUNT(*) AS cnt, MIN(o_orderkey) AS lo
FROM orders WHERE o_orderkey IN (834, 837, 851)
GROUP BY 1 ORDER BY shifted NULLS FIRST LIMIT 60;
