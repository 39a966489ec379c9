SELECT col1, sum(cnt) AS s FROM (
  SELECT col1, cnt FROM (
    SELECT l_returnflag col1, count(distinct l_orderkey) cnt FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey AND o_custkey > 0
    GROUP BY l_returnflag
  ) b WHERE col1 = 'N'
  UNION
  SELECT cast(n_regionkey AS TEXT) AS col1, count(*) AS cnt FROM nation
  WHERE n_regionkey > 2 GROUP BY col1
) a
WHERE round(cast(a.cnt AS FLOAT4)) > 1.0
GROUP BY a.col1
ORDER BY a.col1;
