SELECT SUM(l_linenumber) AS s FROM lineitem LIMIT 1;
