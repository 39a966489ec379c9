SELECT split_part('one,two', ',', 5) AS empty_v, split_part('one,two', ',', 2) AS second_v;
