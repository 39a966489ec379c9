SELECT * FROM lineitem LIMIT l_orderkey;
