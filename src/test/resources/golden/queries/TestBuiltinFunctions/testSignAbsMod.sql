SELECT SIGN(-5) AS s1, SIGN(0) AS s2, SIGN(7.2) AS s3,
       ABS(-42) AS a1, ABS(CAST(-3.5 AS FLOAT8)) AS a2,
       MOD(17, 5) AS m1, MOD(-17, 5) AS m2;
