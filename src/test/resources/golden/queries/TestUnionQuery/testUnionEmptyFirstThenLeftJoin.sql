SELECT a.c_custkey, b.c_custkey AS b_custkey FROM (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 0
  UNION ALL
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey > 0
) a
LEFT OUTER JOIN customer b ON a.c_custkey = b.c_custkey
ORDER BY a.c_custkey;
