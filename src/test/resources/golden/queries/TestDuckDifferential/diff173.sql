SELECT a.n_name AS n1, b.n_name AS n2
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
WHERE a.n_nationkey > 9
ORDER BY n1 NULLS FIRST, n2 NULLS FIRST;
