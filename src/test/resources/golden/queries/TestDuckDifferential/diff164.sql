SELECT c_custkey, NTILE(7) OVER (ORDER BY c_custkey) AS tile
FROM customer WHERE c_custkey > 103
ORDER BY c_custkey NULLS FIRST LIMIT 80;
