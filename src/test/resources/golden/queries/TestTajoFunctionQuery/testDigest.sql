SELECT digest('tajo', 'md5') AS h;
