-- reference: TestGroupByQuery/testDistinctAggregationCaseByCase3.sql — a
-- conditional distinct whose CASE arm is all-NULL (first distinct smaller
-- than second; fixture from TestGroupByQuery.java:466-483)
DROP TABLE IF EXISTS table10;
CREATE TABLE table10 (col1 TEXT, col2 TEXT, col3 TEXT);
INSERT INTO table10 VALUES
  ('a', 'b-1', NULL), ('a', 'b-2', NULL), ('a', 'b-2', NULL),
  ('a', 'b-3', NULL), ('a', 'b-3', NULL), ('a', 'b-3', NULL);
select
  col1,
  count(distinct col2) as cnt1,
  count(distinct case when col3 is not null then col2 else null end) as cnt2
from
  table10
group by
  col1;
