SELECT c_custkey, c_nationkey FROM customer
WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey <= 11)
AND c_custkey BETWEEN 97 AND 105
ORDER BY c_custkey NULLS FIRST LIMIT 60;
