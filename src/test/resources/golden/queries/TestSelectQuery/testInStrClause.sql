SELECT n_nationkey, n_name FROM nation WHERE n_name IN ('NATION_3', 'NATION_7', 'NO_SUCH') ORDER BY n_nationkey;
