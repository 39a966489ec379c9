INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/nested_sample2' USING JSON SELECT 'mr' AS title, named_struct('first_name', 'John', 'last_name', 'Doe') AS name UNION ALL SELECT 'ms', named_struct('first_name', 'Jane', 'last_name', 'Roe');
DROP TABLE IF EXISTS golden_sample2;
CREATE EXTERNAL TABLE golden_sample2 (title TEXT, name RECORD (first_name TEXT, last_name TEXT)) USING JSON LOCATION '/tmp/graft_golden/nested_sample2';
SELECT title, (name.first_name || ' ' || name.last_name) AS full_name FROM golden_sample2 ORDER BY title;
