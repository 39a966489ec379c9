SELECT COUNT(DISTINCT l_returnflag) AS distinct_flags,
       SUM(DISTINCT l_linenumber) AS sum_distinct_lines
FROM lineitem;
