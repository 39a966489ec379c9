SELECT r_regionkey, n_regionkey,
  CASE
    WHEN r_regionkey = 1 THEN 'one'
    WHEN r_regionkey = 2 THEN 'two'
    WHEN r_regionkey = 3 THEN 'three'
    WHEN r_regionkey = 4 THEN 'four'
    ELSE 'zero'
  END AS cond
FROM region, nation
WHERE r_regionkey = n_regionkey
ORDER BY r_regionkey, n_nationkey;
