SELECT a.c_custkey, b.o_custkey, a.cnt FROM (
  SELECT c_custkey, COUNT(*) AS cnt FROM customer GROUP BY c_custkey
) a LEFT OUTER JOIN (
  SELECT o_custkey, COUNT(*) AS cnt FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
) b ON a.c_custkey = b.o_custkey
ORDER BY a.c_custkey LIMIT 20;
