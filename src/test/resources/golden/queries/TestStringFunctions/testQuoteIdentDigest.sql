SELECT quote_ident('select') AS quoted, quote_ident('plain') AS plain,
  digest('graft', 'sha1') AS sha;
