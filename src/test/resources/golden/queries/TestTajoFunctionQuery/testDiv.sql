SELECT div(17, 5) AS d, 17 % 5 AS m;
