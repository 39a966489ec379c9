-- reference: TestWindowQuery/testStdDevSamp1.sql (l_shipmode ->
-- l_shipdate as above)
SELECT
  l_orderkey,
  l_linenumber,
  STDDEV_SAMP(l_linenumber) over (PARTITION BY L_ORDERKEY order by l_shipdate ) as linenumber_stddev_samp,
  STDDEV_SAMP(l_suppkey) over (PARTITION BY L_ORDERKEY order by l_shipdate ) as suppkey_stddev_samp
FROM lineitem
WHERE l_orderkey < 4
ORDER BY l_orderkey, l_linenumber;
