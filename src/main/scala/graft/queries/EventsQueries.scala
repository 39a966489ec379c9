package graft.queries

import graft.QueryDef
import graft.QueryDef.shared

/** Event-stream analytics over the `events` table, batch-first (the
  * reference has no streaming surface — its Kafka connector is a batch scan,
  * reference: tajo-storage/tajo-storage-kafka/src/main/java/org/apache/tajo/
  * storage/kafka/KafkaScanner.java). The same logic is exposed over
  * Structured Streaming in graft.streaming.EventStreams; these batch
  * formulations are the oracle-checked semantics.
  */
object EventsQueries {

  private val qWindowAgg = shared("q_events_window",
    """SELECT DATE_TRUNC('HOUR', ts) AS hour, event_type,
      |  COUNT(*) AS cnt,
      |  COUNT(DISTINCT user_id) AS users,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY DATE_TRUNC('HOUR', ts), event_type
      |ORDER BY hour, event_type""".stripMargin, headline = true)

  // Sliding-window flavor: tumbling day buckets joined to adjacent buckets
  // would shuffle twice; instead express the 3-bucket moving aggregate with
  // a window frame over the pre-aggregated day series (one shuffle).
  private val qSliding = shared("q_events_sliding",
    """WITH daily AS (
      |  SELECT DATE_TRUNC('DAY', ts) AS day, event_type, COUNT(*) AS cnt
      |  FROM events GROUP BY DATE_TRUNC('DAY', ts), event_type
      |)
      |SELECT day, event_type, cnt,
      |  CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS cnt_3d
      |FROM daily
      |ORDER BY day, event_type""".stripMargin)

  // Sessionization: 30-minute inactivity gap via lag + running sum —
  // the batch equivalent of session_window(); partition-parallel by user.
  private val qSessionize = shared("q_events_sessionize",
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) + INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |), sessions AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked
      |)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin, headline = true)

  // Pivot via conditional aggregation (grammar-level PIVOT differs across
  // engines; the Expand-free conditional form is also the scale-friendly one).
  private val qPivot = shared("q_events_pivot",
    """SELECT user_id,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin)

  // Funnel: earliest view -> click -> purchase per user, order-preserving.
  private val qFunnel = shared("q_events_funnel",
    """WITH stages AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id
      |)
      |SELECT
      |  COUNT(*) AS n_users,
      |  COUNT(t_view) AS viewed,
      |  COUNT(CASE WHEN t_click > t_view THEN 1 END) AS clicked_after_view,
      |  COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS full_funnel
      |FROM stages""".stripMargin)

  // Weekly cohort retention: users bucketed by first-seen week, counted in
  // each subsequent active week — two aggregations and one equi-join, all
  // shuffle-on-user_id (linear at any event volume).
  private val qRetention = QueryDef.split("q_events_retention",
    """WITH firstw AS (
      |  SELECT user_id, MIN(DATE_TRUNC('WEEK', ts)) AS cohort FROM events GROUP BY user_id
      |), act AS (
      |  SELECT DISTINCT user_id, DATE_TRUNC('WEEK', ts) AS wk FROM events
      |)
      |SELECT CAST(f.cohort AS DATE) AS cohort,
      |  CAST(DATEDIFF(a.wk, f.cohort) DIV 7 AS BIGINT) AS week_n,
      |  COUNT(*) AS active
      |FROM firstw f JOIN act a ON f.user_id = a.user_id
      |GROUP BY f.cohort, week_n
      |ORDER BY cohort, week_n""".stripMargin,
    """WITH firstw AS (
      |  SELECT user_id, MIN(DATE_TRUNC('WEEK', ts)) AS cohort FROM events GROUP BY user_id
      |), act AS (
      |  SELECT DISTINCT user_id, DATE_TRUNC('WEEK', ts) AS wk FROM events
      |)
      |SELECT CAST(f.cohort AS DATE) AS cohort,
      |  CAST(date_diff('day', f.cohort, a.wk) // 7 AS BIGINT) AS week_n,
      |  COUNT(*) AS active
      |FROM firstw f JOIN act a ON f.user_id = a.user_id
      |GROUP BY f.cohort, week_n
      |ORDER BY cohort, week_n""".stripMargin)

  // SCD2-style validity intervals: collapse each user's event stream into
  // state rows [valid_from, valid_to) per event_type RUN (consecutive
  // identical states merge; a change opens a new row, the last row is open
  // with NULL valid_to) — the slowly-changing-dimension build every
  // warehouse runs on top of a change stream. Gaps-and-islands via two
  // windows: a change flag, a running island id, then one agg per island.
  // Scale: both windows and the aggregation partition by user — no global
  // ordering anywhere; per-user state is the only sort key.
  private val qScd2 = shared("q_events_scd2",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_type,
      |    CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              <> event_type THEN 1 ELSE 0 END AS chg,
      |    event_id
      |  FROM events
      |), islands AS (
      |  SELECT user_id, ts, event_type,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seg
      |  FROM flagged
      |), states AS (
      |  SELECT user_id, event_type, seg,
      |    MIN(ts) AS valid_from, COUNT(*) AS n_events
      |  FROM islands GROUP BY user_id, event_type, seg
      |)
      |SELECT user_id, event_type, CAST(seg AS BIGINT) AS seg, valid_from,
      |  LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, seg) AS valid_to,
      |  CAST(n_events AS BIGINT) AS n_events
      |FROM states
      |ORDER BY user_id, valid_from, seg""".stripMargin)

  val all: Seq[QueryDef] = Seq(qWindowAgg, qSliding, qSessionize, qPivot, qFunnel,
    qRetention, qScd2)
}
