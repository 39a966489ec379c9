SELECT l_orderkey, row_number() OVER (ORDER BY l_quantity * (1 - l_discount), l_orderkey, l_linenumber) AS row_num FROM lineitem ORDER BY row_num LIMIT 15;
