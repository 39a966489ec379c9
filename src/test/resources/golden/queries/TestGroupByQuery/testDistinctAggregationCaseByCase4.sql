-- reference: TestGroupByQuery/testDistinctAggregationCaseByCase4.sql —
-- TAJO-994: distinct over an all-NULL column (fixture from
-- TestGroupByQuery.java:493-508)
DROP TABLE IF EXISTS testDistinctAggregationCaseByCase4;
CREATE TABLE testDistinctAggregationCaseByCase4 (col1 TEXT, col2 TEXT);
INSERT INTO testDistinctAggregationCaseByCase4 VALUES
  ('a', NULL), ('a', NULL), ('a', NULL), ('a', NULL), ('a', NULL);
select
  col1,
  count(distinct col2) as cnt
from
  testDistinctAggregationCaseByCase4
group by
  col1;
