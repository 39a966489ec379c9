DROP TABLE IF EXISTS ins_ast_more;
CREATE TABLE ins_ast_more (rkey INT4, rname TEXT, tagged TEXT);
INSERT INTO ins_ast_more SELECT *, CONCAT('tag-', r_name) FROM region;
SELECT rkey, rname, tagged FROM ins_ast_more ORDER BY rkey;
