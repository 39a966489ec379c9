SELECT c_custkey, c_mktsegment FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey % 2 = 1)
AND c_name >= 'B'
ORDER BY c_custkey NULLS FIRST LIMIT 60;
