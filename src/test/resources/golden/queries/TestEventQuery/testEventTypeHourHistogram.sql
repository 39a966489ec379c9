SELECT event_type, EXTRACT(HOUR FROM ts) AS hr, COUNT(*) AS cnt
FROM events
WHERE event_id < 2000
GROUP BY event_type, EXTRACT(HOUR FROM ts)
HAVING COUNT(*) >= 10
ORDER BY event_type, hr;
