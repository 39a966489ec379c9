SELECT c_custkey, c_mktsegment FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey IN (11, 14, 28))
AND c_name >= 'F'
ORDER BY c_custkey NULLS FIRST LIMIT 60;
