SELECT NULLIF(n_regionkey, 2) AS rk, COUNT(*) AS cnt
FROM nation
GROUP BY NULLIF(n_regionkey, 2)
ORDER BY rk NULLS FIRST;
