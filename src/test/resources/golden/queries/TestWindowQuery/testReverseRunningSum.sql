SELECT n_nationkey,
       SUM(n_nationkey) OVER (ORDER BY n_nationkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS remaining_sum
FROM nation
WHERE n_nationkey < 8
ORDER BY n_nationkey;
