WITH flagged AS (
  SELECT l_orderkey, l_returnflag, CAST(l_quantity AS INT8) AS qty
  FROM lineitem WHERE l_orderkey < 50
)
SELECT a.l_returnflag, SUM(a.qty) AS total, MAX(b.qty) AS biggest
FROM flagged a JOIN flagged b ON a.l_orderkey = b.l_orderkey
GROUP BY a.l_returnflag
ORDER BY a.l_returnflag;
