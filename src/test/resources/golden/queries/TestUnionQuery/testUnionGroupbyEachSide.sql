SELECT l_returnflag AS tag, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT o_orderstatus, COUNT(*) FROM orders GROUP BY o_orderstatus
ORDER BY tag, cnt;
