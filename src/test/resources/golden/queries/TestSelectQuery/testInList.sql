SELECT n_nationkey, n_name FROM nation
WHERE n_name IN ('CHINA', 'INDIA', 'JAPAN') ORDER BY n_name;
