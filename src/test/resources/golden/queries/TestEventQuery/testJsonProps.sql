SELECT event_id, CAST(json_extract_path_text(props, 'k') AS INT8) AS k
FROM events WHERE event_id < 12 ORDER BY event_id;
