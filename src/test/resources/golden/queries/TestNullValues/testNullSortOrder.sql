SELECT NULLIF(r_regionkey, 1) AS k, r_name FROM region ORDER BY k NULLS LAST, r_name;
