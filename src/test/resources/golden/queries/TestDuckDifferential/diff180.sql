SELECT c_custkey, NTILE(5) OVER (ORDER BY c_custkey) AS tile
FROM customer WHERE c_custkey % 4 = 1
ORDER BY c_custkey NULLS FIRST LIMIT 80;
