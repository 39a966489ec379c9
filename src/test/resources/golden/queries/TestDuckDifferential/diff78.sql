SELECT c_custkey, c_mktsegment FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey <= 10)
AND c_name LIKE '%e%'
ORDER BY c_custkey NULLS FIRST LIMIT 60;
