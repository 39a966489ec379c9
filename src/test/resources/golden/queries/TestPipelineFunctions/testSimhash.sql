SELECT simhash32(SPLIT('alpha beta gamma', ' ')) AS h1,
  simhash32(SPLIT('alpha beta gamma', ' ')) AS h1_again,
  simhash32(SPLIT('totally different words', ' ')) AS h2;
