SELECT CASE WHEN c_custkey < 13 THEN 'lo'
  WHEN c_custkey < 40 THEN CASE WHEN c_nationkey % 2 = 0 THEN 'mid-even' ELSE 'mid-odd' END
  ELSE 'hi' END AS cls, COUNT(*) AS cnt
FROM customer WHERE c_name LIKE '%a%'
GROUP BY 1 ORDER BY cls NULLS FIRST;
