SELECT count(*) AS cnt FROM (
  SELECT * FROM lineitem
  UNION
  SELECT * FROM lineitem
) t;
