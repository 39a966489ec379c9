SELECT * FROM (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 5
  UNION ALL
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey > 20
) a
UNION ALL
SELECT * FROM (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 5
  UNION ALL
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey > 20
) b
ORDER BY c_custkey, c_nationkey;
