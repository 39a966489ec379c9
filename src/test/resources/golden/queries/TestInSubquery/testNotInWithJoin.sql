SELECT c.c_custkey, n.n_name FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100)
  AND c.c_custkey < 50
ORDER BY c.c_custkey;
