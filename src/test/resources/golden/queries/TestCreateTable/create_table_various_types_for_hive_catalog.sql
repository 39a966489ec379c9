-- reference: TestCreateTable/create_table_various_types_for_hive_catalog
-- .sql — the uncommented subset the reference keeps for its Hive-metastore
-- catalog (numeric family + binary + blob)
DROP TABLE IF EXISTS various_types_hive;
create table various_types_hive (
  col4 tinyint,
  col5 smallInt,
  col6 integer,
  col7 biginT,
  col8 real,
  col9 float,
  col10 float(53),
  col11 double,
  col12 doublE precision,
  col41 binary,
  col45 blOb
);
DESCRIBE various_types_hive;
