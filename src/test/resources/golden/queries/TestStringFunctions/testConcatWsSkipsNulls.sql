SELECT CONCAT_WS('-', 'a', CAST(NULL AS TEXT), 'b', NULLIF('x', 'x'), 'c') AS joined,
       CONCAT('a', CAST(NULL AS TEXT), 'b') AS concat_with_null;
