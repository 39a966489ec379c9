SELECT SPLIT_PART('a|b|c', '|', 2) AS mid,
  SPLIT_PART('one,two', ',', 1) AS first_tok;
