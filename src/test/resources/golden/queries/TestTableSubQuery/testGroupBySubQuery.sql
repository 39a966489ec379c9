SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)) * CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM (SELECT * FROM lineitem) AS l;
