INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/ins_union_alias' USING TEXT WITH ('text.delimiter'='|')
SELECT l_orderkey AS col1, l_partkey AS col2, l_quantity AS col3 FROM lineitem WHERE l_orderkey < 3
UNION ALL
SELECT o_orderkey AS col4, o_custkey AS col5, o_totalprice AS col6 FROM orders WHERE o_orderkey < 3;
DROP TABLE IF EXISTS golden_ins_union_read;
CREATE EXTERNAL TABLE golden_ins_union_read (c1 FLOAT8, c2 FLOAT8, c3 FLOAT8) USING TEXT WITH ('text.delimiter'='|') LOCATION '/tmp/graft_golden/ins_union_alias';
SELECT c1, c2, c3 FROM golden_ins_union_read ORDER BY c1, c2, c3;
