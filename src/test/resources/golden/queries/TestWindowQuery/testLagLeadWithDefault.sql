SELECT n_nationkey,
       LAG(n_name, 2, 'HEAD') OVER (ORDER BY n_nationkey) AS lag2,
       LEAD(n_name, 2, 'TAIL') OVER (ORDER BY n_nationkey) AS lead2
FROM nation
WHERE n_nationkey < 8
ORDER BY n_nationkey;
