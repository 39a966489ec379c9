SELECT n_name, r_name, n_nationkey + 1 AS p1, r_regionkey + 1 AS p2, n_nationkey + r_regionkey AS p3
FROM nation, region
WHERE n_regionkey = r_regionkey
ORDER BY n_name;
