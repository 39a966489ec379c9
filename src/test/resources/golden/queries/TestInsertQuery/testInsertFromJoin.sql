DROP TABLE IF EXISTS ins_join;
CREATE TABLE ins_join (nname TEXT, rname TEXT);
INSERT INTO ins_join SELECT n.n_name, r.r_name FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey WHERE n.n_nationkey < 5;
SELECT nname, rname FROM ins_join ORDER BY nname;
