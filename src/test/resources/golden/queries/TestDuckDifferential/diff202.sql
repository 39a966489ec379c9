SELECT c_custkey, c_nationkey FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation JOIN customer ON c_nationkey = n_nationkey
  GROUP BY n_nationkey HAVING COUNT(*) > 5
) AND c_custkey <= 96
ORDER BY c_custkey NULLS FIRST LIMIT 70;
