SELECT rk, flag, total FROM (
  SELECT l_returnflag AS flag,
         SUM(CAST(l_quantity AS INT8)) AS total,
         RANK() OVER (ORDER BY SUM(CAST(l_quantity AS INT8)) DESC) AS rk
  FROM lineitem
  GROUP BY l_returnflag
) t
ORDER BY rk;
