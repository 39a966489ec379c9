SELECT c_custkey, c_mktsegment FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey % 6 = 1)
AND c_name LIKE '%o%'
ORDER BY c_custkey NULLS FIRST LIMIT 60;
