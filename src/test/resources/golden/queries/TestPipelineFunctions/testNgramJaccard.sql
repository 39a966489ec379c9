SELECT CAST(SIZE(ARRAY_INTERSECT(ngram_hash_set('a b c d e', 3), ngram_hash_set('a b c d x', 3))) AS BIGINT) AS common,
  CAST(SIZE(ARRAY_UNION(ngram_hash_set('a b c d e', 3), ngram_hash_set('a b c d x', 3))) AS BIGINT) AS total;
