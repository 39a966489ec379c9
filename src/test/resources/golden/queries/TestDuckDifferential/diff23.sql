SELECT r_regionkey FROM region WHERE r_regionkey IN (2, 5, 19)
ORDER BY r_regionkey NULLS FIRST LIMIT 23 OFFSET 9;
