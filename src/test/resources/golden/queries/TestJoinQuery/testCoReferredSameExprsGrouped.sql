SELECT
  n_regionkey + n_nationkey AS v1,
  n_regionkey,
  r_regionkey,
  (r_regionkey + n_regionkey) AS plus1,
  (r_regionkey + n_regionkey) AS plus2,
  ((r_regionkey + n_regionkey) / 2) AS result,
  sum(r_regionkey + n_regionkey) AS total
FROM region, nation
WHERE r_regionkey = n_regionkey AND r_regionkey > 0
GROUP BY
  n_regionkey + n_nationkey,
  n_regionkey,
  r_regionkey,
  (r_regionkey + n_regionkey),
  ((r_regionkey + n_regionkey) / 2)
ORDER BY n_regionkey + n_nationkey, n_regionkey;
