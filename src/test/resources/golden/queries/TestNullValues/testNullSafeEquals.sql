SELECT a.k AS left_k, b.k AS right_k
FROM (SELECT NULLIF(r_regionkey, 2) AS k FROM region) a
JOIN (SELECT NULLIF(r_regionkey, 2) AS k FROM region) b
  ON a.k <=> b.k
ORDER BY left_k NULLS FIRST, right_k NULLS FIRST;
