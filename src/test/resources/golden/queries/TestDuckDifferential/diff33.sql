SELECT c_custkey, c_mktsegment FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey BETWEEN 278 AND 392)
AND SUBSTR(c_name, 1, 1) <> 'z'
ORDER BY c_custkey NULLS FIRST LIMIT 60;
