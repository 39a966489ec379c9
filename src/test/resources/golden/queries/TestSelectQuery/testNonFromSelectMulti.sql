SELECT 1 + 1 AS a, 'ab' || 'c' AS b,
       CASE WHEN 1 < 2 THEN 'yes' ELSE 'no' END AS c,
       CAST(3.5 AS INT4) AS d;
