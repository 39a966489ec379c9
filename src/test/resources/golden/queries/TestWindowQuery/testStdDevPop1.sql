-- reference: TestWindowQuery/testStdDevPop1.sql (l_shipmode -> l_shipdate:
-- the synthetic lineitem has no shipmode column; the running RANGE frame
-- over the order key is the case under test)
SELECT
  l_orderkey,
  l_linenumber,
  STDDEV_POP(l_linenumber) over (PARTITION BY L_ORDERKEY order by l_shipdate ) as linenumber_stddev_pop,
  STDDEV_POP(l_suppkey) over (PARTITION BY L_ORDERKEY order by l_shipdate ) as suppkey_stddev_pop
FROM lineitem
WHERE l_orderkey < 4
ORDER BY l_orderkey, l_linenumber;
