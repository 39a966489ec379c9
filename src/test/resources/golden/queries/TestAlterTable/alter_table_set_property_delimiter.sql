-- reference: TestAlterTable/alter_table_set_property_delimiter.sql +
-- testAlterTableSetProperty.sql — changing 'text.delimiter' changes how
-- the EXISTING data re-reads: ','-delimited rows seen through '|' are one
-- unsplittable field per line (int cast fails to null, name missing)
DROP TABLE IF EXISTS altx;
CREATE TABLE ALTX (id int, name text) USING TEXT WITH ('text.delimiter'=',');
INSERT INTO altx VALUES (1, 'ann'), (2, 'bob');
ALTER TABLE ALTX SET PROPERTY 'text.delimiter'='|';
select id, name from ALTX order by id;
