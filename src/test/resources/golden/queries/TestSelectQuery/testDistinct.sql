SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus;
