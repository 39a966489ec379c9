SELECT NULLIF(n_regionkey, 0) AS k1, NULLIF(MOD(n_nationkey, 2), 0) AS k2, COUNT(*) AS cnt
FROM nation
GROUP BY NULLIF(n_regionkey, 0), NULLIF(MOD(n_nationkey, 2), 0)
ORDER BY k1 NULLS FIRST, k2 NULLS FIRST;
