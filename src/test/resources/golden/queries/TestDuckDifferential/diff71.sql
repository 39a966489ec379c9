SELECT n_nationkey FROM nation WHERE n_nationkey % 5 = 0
ORDER BY n_nationkey NULLS FIRST LIMIT 23 OFFSET 2;
