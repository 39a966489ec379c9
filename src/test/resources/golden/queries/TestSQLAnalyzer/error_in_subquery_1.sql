-- reference: TestSQLAnalyzer/errors/in_subquery_1.sql — `xxx 1from` cannot
-- parse
select
  *
from
  lineitem
where l_orderkey in (
  select xxx 1from inner_table
);
