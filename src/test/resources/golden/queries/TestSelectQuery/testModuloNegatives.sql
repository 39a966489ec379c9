SELECT (7 % 3) AS m1, (-7 % 3) AS m2, (7 % -3) AS m3,
       MOD(-17, 5) AS m4, PMOD(-17, 5) AS m5;
