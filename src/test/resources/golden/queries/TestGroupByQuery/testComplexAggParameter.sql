SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue FROM lineitem;
