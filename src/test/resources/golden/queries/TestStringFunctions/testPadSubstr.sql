SELECT LPAD('7', 3, '0') AS padded, RPAD('x', 4, '.') AS rpadded,
  SUBSTR('abcdefgh', 3, 4) AS mid, LEFT('abcdef', 2) AS l2, RIGHT('abcdef', 2) AS r2;
