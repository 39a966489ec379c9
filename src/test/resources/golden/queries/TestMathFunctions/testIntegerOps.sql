SELECT div(17, 5) AS d, 17 % 5 AS m, ABS(-42) AS a,
  CAST(SIGN(-3.5) AS BIGINT) AS sg, GREATEST(1, 9, 4) AS g, LEAST(1, 9, 4) AS l;
