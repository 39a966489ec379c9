SELECT n_name, c_name, rnk FROM (
  SELECT n_name, c_name,
    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rnk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) t WHERE rnk <= 2 ORDER BY n_name, rnk;
