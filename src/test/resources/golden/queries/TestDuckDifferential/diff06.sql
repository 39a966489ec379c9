SELECT c_custkey, c_mktsegment FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey <= 5)
AND c_name LIKE '%a%'
ORDER BY c_custkey NULLS FIRST LIMIT 60;
