SELECT * FROM lineitem GROUP BY l_orderkey;
