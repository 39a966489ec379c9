WITH per_nation AS (
  SELECT c_nationkey, COUNT(*) AS n_cust,
    SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
  FROM customer GROUP BY c_nationkey
), ranked AS (
  SELECT c_nationkey, n_cust, bal,
    DENSE_RANK() OVER (ORDER BY bal DESC) AS wealth_rank
  FROM per_nation
)
SELECT n_name, n_cust, bal, wealth_rank
FROM ranked JOIN nation ON c_nationkey = n_nationkey
WHERE wealth_rank <= 5 ORDER BY wealth_rank, n_name;
