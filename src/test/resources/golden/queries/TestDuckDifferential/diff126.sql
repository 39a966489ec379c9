SELECT n_nationkey, n_name,
  CASE WHEN n_nationkey * 8 >
    (SELECT COUNT(*) FROM customer WHERE c_custkey BETWEEN 75 AND 93)
    - (SELECT MIN(r_regionkey) FROM region)
  THEN 'big' ELSE 'small' END AS cls
FROM nation
ORDER BY n_nationkey NULLS FIRST;
