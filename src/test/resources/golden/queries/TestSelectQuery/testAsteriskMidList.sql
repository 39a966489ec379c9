SELECT length(l_returnflag) AS rlen, l_extendedprice * l_discount AS disc, *, l_tax * 10 AS tax10
FROM lineitem WHERE l_orderkey < 3 ORDER BY l_orderkey, l_linenumber;
