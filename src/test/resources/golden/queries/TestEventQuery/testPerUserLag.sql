SELECT user_id, event_id, event_type,
  LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
FROM events WHERE user_id < 3 ORDER BY user_id, event_id;
