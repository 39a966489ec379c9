SELECT n.n_name, r.r_name, n.n_regionkey + r.r_regionkey AS key_sum
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE n.n_regionkey + r.r_regionkey > 6
ORDER BY n.n_name;
