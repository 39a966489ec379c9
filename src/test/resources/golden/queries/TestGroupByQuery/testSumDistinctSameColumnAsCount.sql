SELECT l_returnflag,
       SUM(DISTINCT l_linenumber) AS sum_d,
       COUNT(DISTINCT l_linenumber) AS cnt_d,
       COUNT(l_linenumber) AS cnt_all
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag;
