SELECT cnt, row_number() OVER (ORDER BY cnt DESC) AS row_num FROM (
  SELECT COUNT(*) AS cnt FROM lineitem
) t;
