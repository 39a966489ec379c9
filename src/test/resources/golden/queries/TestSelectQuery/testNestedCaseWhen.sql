SELECT n_nationkey,
       CASE WHEN n_regionkey < 2
            THEN CASE WHEN n_nationkey < 5 THEN 'low-early' ELSE 'low-late' END
            ELSE CASE WHEN n_nationkey < 15 THEN 'high-early' ELSE 'high-late' END
       END AS quadrant
FROM nation
WHERE n_nationkey < 20
ORDER BY n_nationkey;
