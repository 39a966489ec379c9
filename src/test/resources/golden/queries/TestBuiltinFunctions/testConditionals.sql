SELECT n_nationkey,
  CASE n_regionkey WHEN 0 THEN 'zero' WHEN 1 THEN 'one' ELSE 'many' END AS simple_case,
  IF(n_nationkey % 2 = 0, 'even', 'odd') AS parity
FROM nation WHERE n_nationkey < 8 ORDER BY n_nationkey;
