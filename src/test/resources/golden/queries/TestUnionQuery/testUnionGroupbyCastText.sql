SELECT col1, cnt FROM (
  SELECT l_returnflag AS col1, count(*) AS cnt FROM lineitem GROUP BY col1
  UNION
  SELECT cast(n_regionkey AS TEXT) AS col1, count(*) AS cnt FROM nation GROUP BY col1
) a
WHERE a.cnt > 1
ORDER BY a.col1;
