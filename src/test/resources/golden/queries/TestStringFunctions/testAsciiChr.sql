SELECT ASCII('A') AS a1, ASCII('z') AS a2,
       CHR(65) AS c1, CHR(122) AS c2,
       ASCII(SUBSTR(n_name, 1, 1)) AS first_char
FROM nation WHERE n_nationkey = 0;
