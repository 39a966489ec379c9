-- reference: TestWindowQuery/testComplexOrderBy1.sql (unique tiebreakers
-- appended to the window order so row_number is deterministic, and the
-- scan bounded for a stable small result)
select
  l_orderkey,
  row_number() over (order by l_quantity * (1 - l_discount), l_orderkey, l_linenumber) row_num
from
  lineitem
where l_orderkey < 4
order by row_num;
