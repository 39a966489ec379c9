SELECT n_nationkey, COALESCE(NULLIF(n_name, 'CHINA'), 'masked') AS nm FROM nation
WHERE n_nationkey < 20 ORDER BY n_nationkey;
