SELECT col1, col2 FROM (
  SELECT l_returnflag AS col1, concat(l_linestatus, '_', l_returnflag) AS col2 FROM lineitem WHERE l_returnflag = 'N'
  UNION ALL
  SELECT l_linestatus AS a1, concat(l_returnflag, '_', l_linestatus) AS a2 FROM lineitem WHERE l_returnflag = 'R'
) t GROUP BY col1, col2 ORDER BY col1, col2;
