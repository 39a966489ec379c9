SELECT int_to_ipstr(3232235777) AS ip, ipstr_to_int('10.0.0.1') AS n;
