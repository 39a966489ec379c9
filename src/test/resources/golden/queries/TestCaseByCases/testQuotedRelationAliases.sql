SELECT "lineitem".l_orderkey AS l_orderkey, "lineitem".l_orderkey AS l_orderkey1, COUNT("lineitem".l_orderkey) AS agg_alias FROM lineitem GROUP BY "lineitem".l_orderkey ORDER BY l_orderkey LIMIT 10;
