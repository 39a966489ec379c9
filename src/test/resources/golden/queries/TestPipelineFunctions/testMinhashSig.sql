SELECT SIZE(minhash_sig('the quick brown fox jumps over the lazy dog', 16, 3)) AS k,
  ELEMENT_AT(minhash_sig('a b c', 16, 3), 1) AS first_min,
  ELEMENT_AT(minhash_sig('a b c', 16, 3), 16) AS last_min;
