SELECT n_nationkey,
       FIRST_VALUE(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey
         ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS prev_or_self,
       LAST_VALUE(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey
         ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS next_or_self
FROM nation
WHERE n_nationkey < 12
ORDER BY n_nationkey;
