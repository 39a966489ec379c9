SELECT COUNT(1) AS cnt FROM lineitem;
