SELECT COUNT(*) AS cnt FROM lineitem;
