SELECT o_orderstatus, COUNT(*) AS cnt FROM orders
GROUP BY ROLLUP(o_orderstatus) ORDER BY o_orderstatus NULLS FIRST;
