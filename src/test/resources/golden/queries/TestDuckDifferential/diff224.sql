SELECT CAST(CAST(o_orderdate AS DATE) + INTERVAL '73' DAY AS DATE) AS shifted,
  COUNT(*) AS cnt, MIN(o_orderkey) AS lo
FROM orders WHERE o_orderkey % 6 = 1
GROUP BY 1 ORDER BY shifted NULLS FIRST LIMIT 60;
