SELECT
  CASE
    WHEN period < 0 THEN 'N/A'
    WHEN period <= INTERVAL '12' HOUR THEN 'C0'
    WHEN period <= INTERVAL '24' HOUR THEN 'C1'
    ELSE 'XX'
  END AS p
FROM (SELECT INTERVAL '12' HOUR AS period, l_orderkey FROM lineitem) t;
