SELECT c_custkey, c_mktsegment FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey BETWEEN 1 AND 5)
AND LENGTH(c_name) > 4
ORDER BY c_custkey NULLS FIRST LIMIT 60;
