SELECT c_custkey, c_mktsegment FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey > 1)
AND SUBSTR(c_name, 1, 1) <> 'x'
ORDER BY c_custkey NULLS FIRST LIMIT 60;
