SELECT * FROM (
  SELECT c_custkey, c_nationkey FROM (
    SELECT c_custkey, c_nationkey FROM (
      SELECT c_custkey, c_nationkey FROM customer) a
    UNION ALL
    SELECT c_custkey, c_nationkey FROM (
      SELECT c_custkey, c_nationkey FROM customer) a
  ) a
) a ORDER BY c_custkey, c_nationkey;
