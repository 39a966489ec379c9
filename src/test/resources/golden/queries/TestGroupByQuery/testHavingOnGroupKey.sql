SELECT n_regionkey, COUNT(*) AS cnt
FROM nation
GROUP BY n_regionkey
HAVING n_regionkey >= 2
ORDER BY n_regionkey;
