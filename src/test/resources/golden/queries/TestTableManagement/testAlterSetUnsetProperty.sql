DROP TABLE IF EXISTS tm_props;
CREATE TABLE tm_props (k INT4, v TEXT);
ALTER TABLE tm_props SET PROPERTY 'graft.note'='alpha';
ALTER TABLE tm_props SET PROPERTY 'graft.other'='beta';
ALTER TABLE tm_props UNSET PROPERTY 'graft.other';
SHOW TBLPROPERTIES tm_props ('graft.note');
