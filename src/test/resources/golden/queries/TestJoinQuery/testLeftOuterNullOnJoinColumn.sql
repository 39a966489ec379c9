SELECT s.s_suppkey, s.s_name
FROM supplier s LEFT OUTER JOIN (
  SELECT DISTINCT l_suppkey FROM lineitem WHERE l_quantity > 49
) l ON s.s_suppkey = l.l_suppkey
WHERE l.l_suppkey IS NULL
ORDER BY s.s_suppkey;
