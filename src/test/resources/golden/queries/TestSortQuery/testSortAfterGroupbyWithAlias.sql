SELECT n_regionkey, COUNT(*) AS cnt
FROM nation
GROUP BY n_regionkey
ORDER BY cnt DESC, n_regionkey;
