SELECT l.l_orderkey, l.l_linenumber, l2.l_quantity AS q2
FROM lineitem l JOIN lineitem l2
  ON l.l_orderkey = l2.l_orderkey
 AND l.l_linenumber = l2.l_linenumber
 AND l2.l_quantity > 45
WHERE l.l_orderkey < 40
ORDER BY l.l_orderkey, l.l_linenumber;
