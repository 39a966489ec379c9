SELECT norm_text('  Hello, World!  42 ') AS n1,
  norm_text('ALL CAPS!!!') AS n2,
  norm_text('') AS n3;
