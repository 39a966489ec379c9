DROP TABLE IF EXISTS part_mgmt_g;
CREATE TABLE part_mgmt_g (v TEXT) PARTITION BY COLUMN(p INT4);
ALTER TABLE part_mgmt_g ADD PARTITION (p=1);
ALTER TABLE part_mgmt_g ADD PARTITION (p=2);
INSERT INTO part_mgmt_g VALUES ('a', 1), ('b', 2), ('c', 2);
ALTER TABLE part_mgmt_g DROP PARTITION (p=2);
SELECT v, p FROM part_mgmt_g ORDER BY v;
