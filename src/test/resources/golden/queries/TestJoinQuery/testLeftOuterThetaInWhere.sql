SELECT a.r_regionkey, a.r_name, b.c_custkey, b.c_name FROM region a LEFT OUTER JOIN customer b
ON a.r_regionkey = b.c_custkey
WHERE a.r_name < b.c_name
ORDER BY a.r_regionkey, b.c_custkey;
