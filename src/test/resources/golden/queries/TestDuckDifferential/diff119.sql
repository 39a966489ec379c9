SELECT n_nationkey FROM nation WHERE n_nationkey IN (16, 19, 33)
ORDER BY n_nationkey NULLS FIRST LIMIT 16 OFFSET 9;
