SELECT temp.r_regionkey AS r_regionkey
FROM (SELECT region.r_regionkey AS r_regionkey FROM region) temp
JOIN region b ON temp.r_regionkey = b.r_regionkey
ORDER BY r_regionkey;
