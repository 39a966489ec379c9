SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
WHERE l_shipdate IN ('1997-11-06', '1996-09-23')
ORDER BY l_orderkey, l_linenumber;
