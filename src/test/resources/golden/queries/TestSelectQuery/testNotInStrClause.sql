SELECT n_nationkey, n_name FROM nation WHERE n_name NOT IN ('NATION_3', 'NATION_7') ORDER BY n_nationkey LIMIT 10;
