SELECT c_mktsegment FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment DESC;
