WITH big_orders AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders
  WHERE o_totalprice > 300000 GROUP BY o_custkey
)
SELECT c_name, n FROM customer JOIN big_orders ON c_custkey = o_custkey
WHERE n >= 3 ORDER BY c_name;
