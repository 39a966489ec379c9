SELECT c_custkey, c_name FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
  AND c_custkey <= 60
ORDER BY c_custkey;
