SELECT * FROM (
  SELECT a.l_orderkey, count(*) AS cnt, sum(l_extendedprice) AS sum1
  FROM lineitem a
  GROUP BY a.l_orderkey
  HAVING sum1 > 70000
) t
WHERE t.cnt > 1
ORDER BY t.l_orderkey
LIMIT 15;
