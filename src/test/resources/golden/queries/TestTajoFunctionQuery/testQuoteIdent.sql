SELECT QUOTE_IDENT('simple') AS q1,
       QUOTE_IDENT('needs quote') AS q2,
       QUOTE_IDENT('has"quote') AS q3;
