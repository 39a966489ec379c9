SELECT c_custkey, NTILE(4) OVER (ORDER BY c_custkey) AS tile
FROM customer WHERE c_custkey IN (38, 41, 55)
ORDER BY c_custkey NULLS FIRST LIMIT 80;
