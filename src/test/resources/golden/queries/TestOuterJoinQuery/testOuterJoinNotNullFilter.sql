SELECT c.c_custkey, c.c_name, n.n_name
FROM customer c
LEFT OUTER JOIN (SELECT * FROM nation WHERE n_nationkey < 10) n
  ON c.c_nationkey = n.n_nationkey
WHERE n.n_nationkey IS NOT NULL AND c.c_custkey < 40
ORDER BY c.c_custkey;
