SELECT n_nationkey, n_name,
  CASE WHEN n_nationkey * 5 >
    (SELECT COUNT(*) FROM customer WHERE c_custkey IN (91, 94, 108))
    - (SELECT MIN(r_regionkey) FROM region)
  THEN 'big' ELSE 'small' END AS cls
FROM nation
ORDER BY n_nationkey NULLS FIRST;
