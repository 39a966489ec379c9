SELECT r_regionkey, r_name FROM region
ORDER BY 'fixed', r_regionkey DESC;
