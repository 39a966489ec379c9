SELECT n_nationkey, n_name,
  CASE WHEN n_nationkey * 5 >
    (SELECT COUNT(*) FROM customer WHERE c_custkey BETWEEN 0 AND 31)
    - (SELECT MIN(r_regionkey) FROM region)
  THEN 'big' ELSE 'small' END AS cls
FROM nation
ORDER BY n_nationkey NULLS FIRST;
