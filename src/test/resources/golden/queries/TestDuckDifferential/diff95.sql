SELECT o_orderkey FROM orders WHERE o_orderkey IN (369, 372, 386)
ORDER BY o_orderkey NULLS FIRST LIMIT 20 OFFSET 4;
