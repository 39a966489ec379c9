SELECT r_regionkey AS k FROM region
UNION ALL
SELECT r_regionkey FROM region WHERE r_regionkey < 2
UNION
SELECT r_regionkey FROM region WHERE r_regionkey > 3
ORDER BY k;
