SELECT CAST(CAST(o_orderdate AS DATE) + INTERVAL '40' DAY AS DATE) AS shifted,
  COUNT(*) AS cnt, MIN(o_orderkey) AS lo
FROM orders WHERE o_orderkey <= 551
GROUP BY 1 ORDER BY shifted NULLS FIRST LIMIT 60;
