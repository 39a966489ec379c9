SELECT CASE WHEN c_custkey < 7 THEN 'lo'
  WHEN c_custkey < 77 THEN CASE WHEN c_nationkey % 2 = 0 THEN 'mid-even' ELSE 'mid-odd' END
  ELSE 'hi' END AS cls, COUNT(*) AS cnt
FROM customer WHERE c_name >= 'P'
GROUP BY 1 ORDER BY cls NULLS FIRST;
