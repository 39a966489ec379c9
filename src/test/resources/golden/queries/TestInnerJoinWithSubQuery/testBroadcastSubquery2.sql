SELECT sum(b.l_quantity) AS qty_sum
FROM (
  SELECT a.l_orderkey, a.l_quantity, a.l_linenumber
  FROM lineitem a JOIN part ON a.l_partkey = p_partkey) b
JOIN orders c ON c.o_orderkey = b.l_orderkey
JOIN (
  SELECT e.l_orderkey, avg(e.l_quantity) avg_quantity
  FROM (
    SELECT d.l_orderkey, d.l_quantity
    FROM lineitem d JOIN part ON d.l_partkey = p_partkey
  ) e
  GROUP BY e.l_orderkey
) f ON c.o_orderkey = f.l_orderkey
WHERE c.o_orderkey > 0 AND b.l_quantity > f.avg_quantity;
