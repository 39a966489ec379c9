SELECT l_orderkey FROM lineitem GROUP BY l_paerkey;
