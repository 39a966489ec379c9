-- reference: TestGroupByQuery/testGroupByWithConstantKeys4.sql — a string
-- literal as a group and order key (bounded for a stable small result)
select
  'day',
  l_orderkey,
  count(*) as sum
from
  lineitem
where l_orderkey < 12
group by
  'day',
  l_orderkey
order by
  'day',
  l_orderkey;
