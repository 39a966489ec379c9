SELECT c.c_custkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'none' ELSE 'some' END AS has_order
FROM customer c LEFT OUTER JOIN (
  SELECT o_custkey, MIN(o_orderkey) AS o_orderkey FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
WHERE c.c_custkey < 20
ORDER BY c.c_custkey;
