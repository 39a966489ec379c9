DROP TABLE IF EXISTS ctas_multi_unions;
CREATE TABLE ctas_multi_unions AS
SELECT * FROM (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 0
  UNION ALL
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey > 20
) a
UNION ALL
SELECT * FROM (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 0
  UNION ALL
  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey > 20
) b;
SELECT c_custkey, c_nationkey FROM ctas_multi_unions ORDER BY c_custkey, c_nationkey;
