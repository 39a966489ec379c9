SELECT o_orderkey, o_orderpriority, o_orderkey + 9 AS bumped, LENGTH(o_orderpriority) AS slen FROM orders
WHERE (o_orderpriority >= 'B' AND o_orderkey BETWEEN 82 AND 175)
ORDER BY o_orderkey NULLS FIRST, o_orderpriority NULLS FIRST, bumped NULLS FIRST, slen NULLS FIRST LIMIT 50;
