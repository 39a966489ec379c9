SELECT CASE WHEN c_custkey < 15 THEN 'lo'
  WHEN c_custkey < 73 THEN CASE WHEN c_nationkey % 2 = 0 THEN 'mid-even' ELSE 'mid-odd' END
  ELSE 'hi' END AS cls, COUNT(*) AS cnt
FROM customer WHERE LENGTH(c_name) > 7
GROUP BY 1 ORDER BY cls NULLS FIRST;
