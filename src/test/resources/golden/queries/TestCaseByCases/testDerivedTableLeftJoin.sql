SELECT c_custkey, o_orderkey, a.cnt
FROM (
  SELECT c_custkey, COUNT(*) AS cnt
  FROM customer
  GROUP BY c_custkey
) a
LEFT OUTER JOIN (
  SELECT o_orderkey, COUNT(*) AS cnt
  FROM orders
  WHERE o_orderkey IS NOT NULL
  GROUP BY o_orderkey
) b ON (a.c_custkey = b.o_orderkey)
ORDER BY c_custkey
LIMIT 20;
