SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type;
