SELECT n_nationkey,
       SUM(n_nationkey) OVER (ORDER BY n_nationkey ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS windowed
FROM nation
WHERE n_nationkey < 10
ORDER BY n_nationkey;
