SELECT col1, col2, col3 FROM (
  SELECT l_returnflag AS col1, l_extendedprice AS col2, concat(l_shipdate, l_linestatus) AS col3 FROM lineitem
  UNION
  SELECT p_type AS col1, p_retailprice col2, p_name col3 FROM part
) a
WHERE col3 LIKE '1996%' AND col2 > 60000
ORDER BY col1, col2, col3;
