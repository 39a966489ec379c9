SELECT l_orderkey, '20130819' AS date1, '20130819', '20130819', '20130819'
FROM lineitem WHERE l_orderkey < 3 ORDER BY l_orderkey;
