SELECT vec_dot(ARRAY(1.0D, 2.0D, 3.0D), ARRAY(4.0D, 5.0D, 6.0D)) AS d,
  vec_dot(ARRAY(1.0D), ARRAY(1.0D, 2.0D)) AS len_mismatch;
