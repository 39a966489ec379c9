SELECT n_regionkey,
       COUNT(NULLIF(n_nationkey, 10)) AS cnt_nonnull,
       COUNT(*) AS cnt_all,
       SUM(NULLIF(n_nationkey, 10)) AS sum_nonnull
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey;
