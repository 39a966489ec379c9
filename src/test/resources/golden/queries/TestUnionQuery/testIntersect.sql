SELECT n_regionkey AS k FROM nation
INTERSECT
SELECT r_regionkey FROM region WHERE r_regionkey < 3
ORDER BY k;
