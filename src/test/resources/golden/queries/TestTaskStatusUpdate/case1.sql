-- reference: TestTaskStatusUpdate/case1.sql
select l_linenumber, count(1) as unique_key from lineitem group by l_linenumber order by l_linenumber;
