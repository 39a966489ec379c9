SELECT split_part(split_part('a:b;c:d', ';', 2), ':', 1) AS v;
