SELECT o_orderstatus, o_orderkey FROM orders WHERE o_orderkey <= 50
ORDER BY o_orderstatus DESC, o_orderkey ASC;
