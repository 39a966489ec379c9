SELECT c_custkey, c_nationkey FROM customer
WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey IN (1, 4, 18))
AND c_custkey BETWEEN 18 AND 54
ORDER BY c_custkey NULLS FIRST LIMIT 60;
