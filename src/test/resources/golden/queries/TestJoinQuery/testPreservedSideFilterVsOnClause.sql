SELECT r.r_regionkey,
       n_on.n_name AS filtered_in_on,
       n_wh.n_name AS same_row_for_where
FROM region r
LEFT OUTER JOIN nation n_on
  ON r.r_regionkey = n_on.n_regionkey AND n_on.n_nationkey < 2
LEFT OUTER JOIN nation n_wh
  ON r.r_regionkey = n_wh.n_regionkey AND n_wh.n_nationkey = n_on.n_nationkey
ORDER BY r.r_regionkey, filtered_in_on;
