SELECT n_nationkey,
       ROW_NUMBER() OVER (ORDER BY n_nationkey) + 100 AS shifted,
       CASE WHEN RANK() OVER (ORDER BY n_regionkey) <= 5 THEN 'top' ELSE 'rest' END AS bucket
FROM nation
WHERE n_nationkey < 10
ORDER BY n_nationkey;
