SELECT l_linenumber, l_orderkey AS sortkey FROM lineitem
WHERE l_orderkey < 30
ORDER BY l_linenumber, l_orderkey, (l_orderkey IS NULL);
