SELECT c_custkey, c_nationkey FROM customer
WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey BETWEEN 1 AND 5)
AND c_custkey <= 27
ORDER BY c_custkey NULLS FIRST LIMIT 60;
