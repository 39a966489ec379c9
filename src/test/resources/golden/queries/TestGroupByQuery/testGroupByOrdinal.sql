SELECT l_returnflag, COUNT(*) AS cnt
FROM lineitem
GROUP BY 1
ORDER BY 1;
