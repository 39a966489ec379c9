SELECT a.k AS left_k, b.k AS right_k
FROM (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 4) a
FULL OUTER JOIN (SELECT n_nationkey AS k FROM nation WHERE n_nationkey BETWEEN 2 AND 6) b
  ON a.k = b.k
ORDER BY left_k NULLS LAST, right_k NULLS LAST;
