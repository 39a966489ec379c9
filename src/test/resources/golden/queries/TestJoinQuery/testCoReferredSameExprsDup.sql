SELECT
  n_regionkey + n_nationkey AS v1,
  n_regionkey,
  r_regionkey,
  (r_regionkey + n_regionkey) AS plus1,
  (r_regionkey + n_regionkey) AS plus2,
  ((r_regionkey + n_regionkey) / 2) AS result
FROM region, nation
WHERE r_regionkey = n_regionkey AND r_regionkey > 0
ORDER BY n_regionkey + n_nationkey, n_regionkey;
