SELECT utc_usec_to('day', 86400000000 + 123) AS day_floor,
  utc_usec_to('hour', 7200000000 + 999) AS hour_floor;
