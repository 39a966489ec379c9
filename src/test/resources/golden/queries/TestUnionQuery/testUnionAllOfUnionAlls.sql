SELECT * FROM (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 0
  UNION ALL
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey > 0
) a
UNION ALL
SELECT * FROM (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 0
  UNION ALL
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey > 0
) b
ORDER BY c_custkey, c_nationkey;
