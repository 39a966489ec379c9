SELECT x.nk, x.cnt,
  RANK() OVER (ORDER BY x.cnt DESC, x.nk) AS rk
FROM (
  SELECT c.c_nationkey AS nk, COUNT(*) AS cnt
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE c.c_custkey % 3 = 0
  GROUP BY c.c_nationkey
) x ORDER BY x.nk NULLS FIRST;
