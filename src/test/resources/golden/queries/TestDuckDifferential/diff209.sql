SELECT CASE WHEN c_custkey < 8 THEN 'lo'
  WHEN c_custkey < 38 THEN CASE WHEN c_nationkey % 2 = 0 THEN 'mid-even' ELSE 'mid-odd' END
  ELSE 'hi' END AS cls, COUNT(*) AS cnt
FROM customer WHERE SUBSTR(c_name, 1, 1) <> 'q'
GROUP BY 1 ORDER BY cls NULLS FIRST;
