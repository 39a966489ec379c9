SELECT n_name FROM nation
WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'AFRICA' OR r_name = 'ASIA')
ORDER BY n_name;
