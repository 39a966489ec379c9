SELECT r1.r_regionkey AS a, r2.r_regionkey AS b FROM region r1
JOIN region r2 ON r1.r_regionkey < r2.r_regionkey ORDER BY a, b;
