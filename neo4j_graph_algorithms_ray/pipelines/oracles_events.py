"""DuckDB oracle SQL for the event-stream operators
(functions/events.py): tumbling-window aggregate, gap sessionization,
and the as-of join. Generated from the same window/gap constants as the
driver queries so the two sides cannot drift.
"""

from __future__ import annotations


def window_agg_sql(window_s: int = 3600) -> str:
    win_us = window_s * 1_000_000
    return f"""SELECT CAST(epoch_us(ts) // {win_us} AS BIGINT) * {window_s} AS window_start_s,
       event_type,
       COUNT(*) AS n_events,
       round(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""


def sessionize_sql(gap_s: int = 1800) -> str:
    gap_us = gap_s * 1_000_000
    return f"""SELECT event_id, user_id,
       CAST(SUM(CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
                THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
FROM (SELECT event_id, user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events)
ORDER BY event_id"""


def session_stats_sql(gap_s: int = 1800) -> str:
    gap_us = gap_s * 1_000_000
    return f"""WITH seq AS (
  SELECT event_id, user_id, ts,
         CAST(SUM(CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
                  THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM (SELECT event_id, user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events))
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MIN(epoch_us(ts)) AS start_us,
       MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us
FROM seq GROUP BY user_id, session_seq ORDER BY user_id, session_seq"""


ASOF_PURCHASE_SQL = """SELECT e.event_id, e.user_id,
       COALESCE(p.event_id, -1) AS prev_purchase_id
FROM events e ASOF LEFT JOIN
     (SELECT user_id, ts, event_id FROM events
      WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts > p.ts
ORDER BY e.event_id"""


def funnel_sql(steps=("view", "click", "purchase"), within_s: int = 86400) -> str:
    """Mirror of functions/events.funnel: step i+1 strictly after step i
    and within ``within_s`` seconds; t_i = earliest qualifying event."""
    within_us = int(within_s) * 1_000_000
    ctes = ["u AS (SELECT DISTINCT user_id FROM events)",
            f"""s1 AS (SELECT user_id, min(epoch_us(ts)) AS t
  FROM events WHERE event_type = '{steps[0]}' GROUP BY user_id)"""]
    for i in range(1, len(steps)):
        ctes.append(f"""s{i+1} AS (
  SELECT p.user_id, min(epoch_us(ev.ts)) AS t
  FROM s{i} p JOIN events ev ON ev.user_id = p.user_id
   AND ev.event_type = '{steps[i]}'
   AND epoch_us(ev.ts) > p.t AND epoch_us(ev.ts) <= p.t + {within_us}
  GROUP BY p.user_id)""")
    cases = " + ".join(
        f"CASE WHEN s{i+1}.t IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(len(steps)))
    joins = "\n".join(f"LEFT JOIN s{i+1} ON s{i+1}.user_id = u.user_id"
                      for i in range(len(steps)))
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT u.user_id, CAST({cases} AS BIGINT) AS steps_completed
FROM u
{joins}
ORDER BY u.user_id""")


def retention_sql(bucket_s: int = 604800) -> str:
    """Mirror of functions/events.retention_cohorts (epoch-aligned
    buckets of ``bucket_s`` seconds)."""
    bucket_us = int(bucket_s) * 1_000_000
    return f"""WITH ub AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {bucket_us} AS w FROM events),
fw AS (SELECT user_id, min(w) AS cohort FROM ub GROUP BY user_id)
SELECT fw.cohort, ub.w - fw.cohort AS age, count(*) AS n_users
FROM ub JOIN fw ON fw.user_id = ub.user_id
GROUP BY fw.cohort, ub.w - fw.cohort
ORDER BY cohort, age"""


def hopping_agg_sql(window_s: int = 3600, hop_s: int = 900) -> str:
    """Hopping-window mirror: each event contributes to window_s/hop_s
    overlapping windows (every replica is in range by construction —
    W − j·H ≥ H > ts mod H for j < W/H)."""
    hop_us = hop_s * 1_000_000
    reps = window_s // hop_s
    return f"""SELECT (CAST(epoch_us(ts) // {hop_us} AS BIGINT) - j) * {hop_s}
         AS window_start_s,
       event_type,
       COUNT(*) AS n_events,
       round(SUM(value), 6) AS sum_value
FROM events CROSS JOIN (SELECT unnest(range({reps})) AS j) r
GROUP BY 1, 2 ORDER BY 1, 2"""


def window_unique_users_sql(window_s: int = 3600) -> str:
    win_us = window_s * 1_000_000
    return f"""SELECT CAST(epoch_us(ts) // {win_us} AS BIGINT) * {window_s}
         AS window_start_s,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1 ORDER BY 1"""


LATEST_EVENT_SQL = """SELECT user_id, epoch_us(ts) AS ts_us, event_id,
       event_type, value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id ASC) AS rn
      FROM events) t
WHERE rn = 1 ORDER BY user_id"""


def window_topk_types_sql(window_s: int = 3600, k: int = 3) -> str:
    """Mirror of events.window_topk_types: tumbling count per type,
    row_number per window (n desc, type asc), top-k."""
    return f"""WITH agg AS (
  SELECT (epoch_us(ts) // (CAST({window_s} AS BIGINT) * 1000000))
           * {window_s} AS window_start_s,
         event_type, count(*) AS n_events
  FROM events GROUP BY 1, 2),
rk AS (SELECT *, row_number() OVER (PARTITION BY window_start_s
                                    ORDER BY n_events DESC,
                                             event_type ASC) AS rn
       FROM agg)
SELECT window_start_s, event_type, CAST(n_events AS BIGINT) AS n_events
FROM rk WHERE rn <= {k}
ORDER BY window_start_s, n_events DESC, event_type"""


def window_anomaly_sql(window_s: int = 3600, z: float = 2.0) -> str:
    """Mirror of events.window_anomaly: tumbling counts z-scored
    against the all-windows mean / population std; the anomaly flag
    compares the ROUNDED z, as the engine does."""
    return f"""WITH agg AS (
  SELECT (epoch_us(ts) // (CAST({window_s} AS BIGINT) * 1000000))
           * {window_s} AS window_start_s,
         count(*) AS n_events
  FROM events GROUP BY 1),
st AS (SELECT avg(n_events) AS m, stddev_pop(n_events) AS sd FROM agg)
SELECT window_start_s, CAST(n_events AS BIGINT) AS n_events,
       round(CASE WHEN st.sd > 0 THEN (n_events - st.m) / st.sd
                  ELSE 0 END, 6) AS z,
       CASE WHEN st.sd > 0
            THEN abs(round((n_events - st.m) / st.sd, 6)) > {z}
            ELSE FALSE END AS is_anomaly
FROM agg CROSS JOIN st ORDER BY window_start_s"""


# Mirrors functions/events.event_transitions: LAG over each user's
# (ts, event_id)-ordered stream, global pair counts.
EVENT_TRANSITIONS_SQL = """WITH lagged AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM lagged WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type ORDER BY from_type, to_type"""


def conversion_lag_sql(step_a: str = "view", step_b: str = "purchase") -> str:
    """Mirror of _q_conversion_lag: first step_a per user, earliest
    strictly-later step_b, lag stats in seconds."""
    return f"""WITH a AS (
  SELECT user_id, min(ts) AS ta FROM events
  WHERE event_type = '{step_a}' GROUP BY user_id),
b AS (
  SELECT e.user_id, min(e.ts) AS tb
  FROM events e JOIN a ON a.user_id = e.user_id
  WHERE e.event_type = '{step_b}' AND e.ts > a.ta
  GROUP BY e.user_id),
l AS (SELECT CAST(date_diff('microsecond', a.ta, b.tb) AS DOUBLE)
             / 1000000 AS lag_s
      FROM b JOIN a ON a.user_id = b.user_id)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_users_start,
       CAST(count(*) AS BIGINT) AS n_converted,
       round(avg(lag_s), 6) AS mean_lag_s,
       round(max(lag_s), 6) AS max_lag_s
FROM l"""


VALUE_PERCENTILES_SQL = """WITH h AS (
  SELECT event_type, value AS v, count(*) AS n
  FROM events GROUP BY event_type, value),
c AS (SELECT event_type, v,
             sum(n) OVER (PARTITION BY event_type ORDER BY v) AS cum
      FROM h),
nn AS (SELECT event_type, count(*) AS N FROM events GROUP BY event_type),
ps AS (SELECT unnest([50, 90, 99]) AS pct)
SELECT c.event_type, CAST(ps.pct AS BIGINT) AS pct,
       round(min(c.v), 6) AS value
FROM ps CROSS JOIN nn
JOIN c ON c.event_type = nn.event_type
      AND c.cum >= ceil(nn.N * ps.pct / 100.0)
GROUP BY c.event_type, ps.pct ORDER BY c.event_type, pct"""
