-- reference: TestAlterTable/alter_table_set_property_timezone.sql +
-- testAlterTableSetProperty2.sql
DROP TABLE IF EXISTS alty;
CREATE TABLE ALTY (id int, name text);
INSERT INTO alty VALUES (1, 'ann'), (2, 'bob');
ALTER TABLE ALTY SET PROPERTY 'timezone'='GMT-7';
select id, name from ALTY order by id;
