SELECT
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1d 2h 30m' AS plus_compact,
  TIMESTAMP '2024-06-15 12:00:00' - INTERVAL '90 mins' AS minus_mins,
  DATE '2020-02-29' + INTERVAL '4 yrs' AS leap_plus_years,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1:30:15' AS plus_colon;
