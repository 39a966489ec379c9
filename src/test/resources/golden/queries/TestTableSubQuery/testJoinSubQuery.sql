SELECT a.n_regionkey, b.r_regionkey, a.n_name, b.r_name
FROM (SELECT * FROM nation WHERE n_name LIKE 'NATION_1%') a
JOIN region b ON a.n_regionkey = b.r_regionkey
ORDER BY a.n_name, b.r_regionkey;
